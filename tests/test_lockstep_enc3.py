"""enc3 sort-based encoder: interpret-mode parity with the hash16 dense
oracle.

The v3 engine's contract is byte-exactness to golden.compress_dense
(hashlog=16) — NOT LZ4_compress_default parity; the dense parse
compresses slightly better in aggregate (see
test_golden_dense_size_contract in test_lockstep_enc2). One compact
launch per case: interpret mode is slow.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden


def _run(blocks, bs, accel=1, group_sort=True):
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    comp, clen, err = compress_blocks_lockstep_enc3(
        raw, rlen, bs, accel=accel, interpret=True, group_sort=group_sort)
    comp = np.asarray(comp)
    for j, b in enumerate(blocks):
        want = golden.compress_dense(b, acceleration=accel, hashlog=16)
        assert not bool(err[j]), f"block {j}: err"
        got = bytes(comp[j, :int(clen[j])])
        assert got == want, f"block {j}: {len(got)}B vs {len(want)}B"
        assert golden.decompress(got, len(b)) == b


def test_enc3_pass1_candidates():
    """The sort kernel's d16 tape must match dense_candidates(hashlog=16,
    no val16 prefilter) exactly, in position order."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    rng = np.random.RandomState(5)
    bs = 1024
    blocks = [
        (b"abcab" * 300)[:bs],
        bytes(rng.randint(0, 256, bs).astype(np.uint8)),
        bytes(rng.randint(0, 4, bs).astype(np.uint8)),
        bytes(bs),
        b"xyz",                         # < MINMATCH positions
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    cand, dens = compress_blocks_lockstep_enc3(
        raw, rlen, bs, interpret=True, cand_only=True)
    cand = np.asarray(cand)
    np_rows = cand.shape[1]
    for j, b in enumerate(blocks):
        want = golden.dense_candidates(b, hashlog=16, val16_filter=False)
        wantp = np.zeros(np_rows, np.int64)
        wantp[:len(want)] = want
        got = cand[0, :, j] & 0xFFFF
        pos = (cand[0, :, j] >> 16) & 0xFFFF
        assert np.array_equal(pos, np.arange(np_rows)), f"block {j}: order"
        assert np.array_equal(got, wantp), f"block {j}: d16"
        assert int(dens[0, 0, j]) == int((wantp != 0).sum())


def test_enc3_parity_small():
    rng = np.random.RandomState(9)
    bs = 512
    blocks = [
        bytes(bs),                                       # zeros
        b"the quick brown fox " * 25,                    # text
        bytes(rng.randint(0, 256, bs, np.int64).astype(np.uint8)),
        b"ab" * (bs // 2),                               # offset-2
        (bytes(rng.randint(0, 256, 100).astype(np.uint8)) * 6)[:bs],
        b"z" * 37,
        b"",
        b"abc",                                          # < MIN_LENGTH
        bytes(rng.randint(0, 3, bs, np.int64).astype(np.uint8)),
        # a TAIL-streamed sequence (lit >= 15) followed by a matchless
        # random tail (the mid-round FHDR-entry regression from enc2)
        bytes(rng.randint(0, 256, 20).astype(np.uint8)) + bytes(100)
        + bytes(rng.randint(0, 256, 392).astype(np.uint8)),
    ]
    _run(blocks, bs)


def test_enc3_parity_multigroup():
    """> 128 blocks exercises the density regrouping permutation and its
    inverse (blocks must come back in caller order)."""
    rng = np.random.RandomState(12)
    bs = 256
    blocks = []
    for j in range(130):
        kind = j % 3
        if kind == 0:
            blocks.append(bytes(rng.randint(0, 256, bs).astype(np.uint8)))
        elif kind == 1:
            blocks.append((b"lorem ipsum " * 40)[:bs])
        else:
            blocks.append(bytes(rng.randint(0, 3, bs).astype(np.uint8)))
    _run(blocks, bs)


def test_golden_dense_size_contract():
    """Dense parse output must decode and stay within the size envelope
    of the reference encoder on a compressibility spectrum (both hashlog
    contracts)."""
    rng = np.random.RandomState(11)
    for hl in (13, 16):
        total_d = total_r = 0
        for blk in [
            bytes(4096),
            (b"the quick brown fox jumps " * 200)[:4096],
            bytes(rng.randint(0, 256, 4096, np.int64).astype(np.uint8)),
            bytes(rng.randint(0, 4, 4096, np.int64).astype(np.uint8)),
        ]:
            d = golden.compress_dense(blk, hashlog=hl)
            r = golden.compress(blk)
            assert golden.decompress(d, len(blk)) == blk
            total_d += len(d)
            total_r += len(r)
        assert total_d <= total_r * 1.01   # aggregate dominance (measured
        # 0.990-0.996x on real corpora; 1% slack for this tiny fixture set)


@pytest.mark.slow
def test_enc3_acceleration():
    rng = np.random.RandomState(10)
    parts = []
    for _ in range(40):
        parts.append(bytes(rng.randint(0, 256, 23).astype(np.uint8)))
        parts.append(b"MAGIC")
    data = b"".join(parts) + bytes(60)
    bs = len(data)
    _run([data, bytes(bs), data[::-1]], bs, accel=8)
    a1 = golden.compress_dense(data, hashlog=16)
    a8 = golden.compress_dense(data, acceleration=8, hashlog=16)
    assert a1 != a8 and len(a8) >= len(a1)


def test_golden_segmented_roundtrip():
    """compress_segmented: valid single-block streams, any-decoder
    decodable, across boundary shapes (multi-seg, ragged, all-literal
    carries, zeros)."""
    from __graft_entry__ import _synth_corpus
    rng = np.random.RandomState(13)
    cases = [
        _synth_corpus(3 * 65536 + 777),
        bytes(2 * 65536 + 5),
        bytes(rng.randint(0, 256, 2 * 65536 + 100).astype(np.uint8)),
        _synth_corpus(65536),
        b"",
        b"xy",
    ]
    for i, data in enumerate(cases):
        s = golden.compress_segmented(data, seg=65536)
        assert golden.decompress(s, len(data)) == data, i
    # small segments stress the splice (many boundaries, carry chains)
    for i, data in enumerate(cases[:4]):
        s = golden.compress_segmented(data, seg=4096)
        assert golden.decompress(s, len(data)) == data, (i, 4096)


@pytest.mark.slow
def test_enc3_tails_match_oracle_and_splice():
    """The kernel's tail output equals golden.tail_offset, and splicing
    kernel segment streams reproduces golden.compress_segmented."""
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    seg = 2048
    data = _synth_corpus(3 * seg + 501, seed=21)
    nseg = -(-len(data) // seg)
    raw = np.zeros((nseg, seg), np.uint8)
    rlen = np.zeros(nseg, np.int32)
    for s in range(nseg):
        part = data[s * seg:(s + 1) * seg]
        raw[s, :len(part)] = np.frombuffer(part, np.uint8)
        rlen[s] = len(part)
    comp, clen, err, tails = compress_blocks_lockstep_enc3(
        raw, rlen, seg, interpret=True, return_tails=True)
    comp, clen = np.asarray(comp), np.asarray(clen)
    err, tails = np.asarray(err), np.asarray(tails)
    assert not err.any()
    streams = [comp[s, :clen[s]].tobytes() for s in range(nseg)]
    for s, st in enumerate(streams):
        assert int(tails[s]) == golden.tail_offset(st), s
    spliced = golden.splice_segments(streams, [int(t) for t in tails])
    want = golden.compress_segmented(data, seg=seg)
    assert spliced == want
    assert golden.decompress(spliced, len(data)) == data


@pytest.mark.slow
def test_enc3_deep_parity():
    """depth=3 engine: byte-exact vs golden.compress_deep, and the deep
    stream is never larger than the greedy one in aggregate."""
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    rng = np.random.RandomState(17)
    bs = 1024
    blocks = [
        _synth_corpus(bs, seed=3),
        (bytes(rng.randint(0, 256, 96).astype(np.uint8)) * 12)[:bs],
        bytes(rng.randint(0, 4, bs).astype(np.uint8)),
        bytes(bs),
        bytes(rng.randint(0, 256, bs).astype(np.uint8)),
        b"deep" * 7,
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    comp, clen, err = compress_blocks_lockstep_enc3(
        raw, rlen, bs, interpret=True, depth=3)
    comp = np.asarray(comp)
    tot_deep = tot_greedy = 0
    for j, b in enumerate(blocks):
        want = golden.compress_deep(b)
        assert not bool(err[j]), f"block {j}: err"
        got = bytes(comp[j, :int(clen[j])])
        assert got == want, f"block {j}: {len(got)}B vs {len(want)}B"
        assert golden.decompress(got, len(b)) == b
        tot_deep += len(want)
        tot_greedy += len(golden.compress_dense(b, hashlog=16))
    assert tot_deep <= tot_greedy


@pytest.mark.slow
def test_enc3_depth5_parity():
    """depth=5 engine (dense_gaps2 second tape): byte-exact vs
    golden.compress_deep(depth=5), never larger than depth 3 in
    aggregate."""
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    rng = np.random.RandomState(23)
    bs = 1024
    blocks = [
        _synth_corpus(bs, seed=5),
        (bytes(rng.randint(0, 256, 96).astype(np.uint8)) * 12)[:bs],
        bytes(rng.randint(0, 4, bs).astype(np.uint8)),
        bytes(bs),
        bytes(rng.randint(0, 256, bs).astype(np.uint8)),
        b"deeper" * 5,
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    comp, clen, err = compress_blocks_lockstep_enc3(
        raw, rlen, bs, interpret=True, depth=5)
    comp = np.asarray(comp)
    tot5 = tot3 = 0
    for j, b in enumerate(blocks):
        want = golden.compress_deep(b, depth=5)
        assert not bool(err[j]), f"block {j}: err"
        got = bytes(comp[j, :int(clen[j])])
        assert got == want, f"block {j}: {len(got)}B vs {len(want)}B"
        assert golden.decompress(got, len(b)) == b
        tot5 += len(want)
        tot3 += len(golden.compress_deep(b))
    assert tot5 <= tot3
