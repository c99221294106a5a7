"""enc2 dense encoder: interpret-mode parity with golden.compress_dense.

The v2 engine's contract is byte-exactness to the dense-candidate
oracle (NOT LZ4_compress_default parity — the dense parse compresses
slightly better in aggregate; see test_golden_dense for the size
contract). One compact launch per case: interpret mode is slow.
"""

import numpy as np

from lz4_sgori_tpu import golden


def _run(blocks, bs, accel=1):
    from lz4_sgori_tpu.ops.pallas.lockstep_enc2 import (
        compress_blocks_lockstep_enc2)
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    comp, clen, err = compress_blocks_lockstep_enc2(
        raw, rlen, bs, accel=accel, interpret=True)
    comp = np.asarray(comp)
    for j, b in enumerate(blocks):
        want = golden.compress_dense(b, acceleration=accel)
        assert not bool(err[j]), f"block {j}: err"
        got = bytes(comp[j, :int(clen[j])])
        assert got == want, f"block {j}: {len(got)}B vs {len(want)}B"
        assert golden.decompress(got, len(b)) == b


def test_enc2_parity_small():
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
        # regression: a TAIL-streamed sequence (lit >= 15) followed by a
        # matchless random tail — the last-literals header must start at
        # hk=0, not at the previous TAIL's leftover progress (the
        # mid-round FHDR-entry bug dropped its first 2 bytes)
        bytes(rng.randint(0, 256, 20).astype(np.uint8)) + bytes(100)
        + bytes(rng.randint(0, 256, 392).astype(np.uint8)),
    ]
    _run(blocks, bs)


def test_enc2_acceleration():
    rng = np.random.RandomState(10)
    # isolated 5-byte repeats inside unique noise: the skip search at
    # accel=8 probes every 8th position and misses some irrecoverably
    # (catch-up can't help across unique bytes), unlike accel=1
    parts = []
    for _ in range(40):
        parts.append(bytes(rng.randint(0, 256, 23).astype(np.uint8)))
        parts.append(b"MAGIC")
    data = b"".join(parts) + bytes(60)
    bs = len(data)
    _run([data, bytes(bs), data[::-1]], bs, accel=8)
    # acceleration must change output like the oracle's (skip search
    # probes fewer positions -> different, larger stream)
    a1 = golden.compress_dense(data)
    a8 = golden.compress_dense(data, acceleration=8)
    assert a1 != a8 and len(a8) >= len(a1)


def test_golden_dense_size_contract():
    """Dense parse output must decode and stay within the size envelope
    of the reference encoder on a compressibility spectrum."""
    rng = np.random.RandomState(11)
    total_d = total_r = 0
    for blk in [
        bytes(4096),
        (b"the quick brown fox jumps " * 200)[:4096],
        bytes(rng.randint(0, 256, 4096, np.int64).astype(np.uint8)),
        bytes(rng.randint(0, 4, 4096, np.int64).astype(np.uint8)),
    ]:
        d = golden.compress_dense(blk)
        r = golden.compress(blk)
        assert golden.decompress(d, len(blk)) == blk
        total_d += len(d)
        total_r += len(r)
    assert total_d <= total_r * 1.01    # aggregate dominance (measured
    # 0.992-0.996x on real corpora; 1% slack for this tiny fixture set)
