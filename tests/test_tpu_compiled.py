"""Opt-in on-device lane: parity + malformed-stream suites against the
*compiled* PRODUCTION engines — the v6 ring decoder and the enc3 sort
encoder (plus one check of the escape-hatch kernels).

Run during the bench session:
    LZ4J_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q

Interpret-mode tests (the default CPU lane) cannot observe compiled-only
failure modes: out-of-bounds indexing is masked by numpy clamping and
Mosaic's lowering differs from the interpreter (the round-1 OOB bug was
only visible compiled). Round-2 verdict item 4: this lane previously
exercised only the superseded round-1 kernels.
"""

import numpy as np
import pytest

import jax

from lz4_sgori_tpu import format as F
from lz4_sgori_tpu import golden

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if not _on_tpu():
        pytest.skip("no TPU backend attached")


BS = 4096


def _pack(blocks, width):
    arr = np.zeros((len(blocks), width), np.uint8)
    lens = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        arr[j, :len(b)] = np.frombuffer(b, np.uint8)
        lens[j] = len(b)
    return arr, lens


def test_compiled_enc3_parity(fixtures):
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    names = ["text_small", "zeros_4k", "rle_period3", "random_4k",
             "structured"]
    raws = [fixtures[n][:BS] for n in names]
    raw, rlen = _pack(raws, BS)
    comp, clen, err = compress_blocks_lockstep_enc3(raw, rlen, BS)
    comp, clen, err = np.asarray(comp), np.asarray(clen), np.asarray(err)
    for j, data in enumerate(raws):
        assert not err[j], names[j]
        want = golden.compress_dense(data, hashlog=16)
        got = comp[j, :clen[j]].tobytes()
        assert got == want, names[j]


def test_compiled_enc3_64k_accel(fixtures):
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    data = fixtures["mixed"][:65536]
    raw, rlen = _pack([data], 65536)
    for accel in (1, 8):
        comp, clen, err = compress_blocks_lockstep_enc3(
            raw, rlen, 65536, accel=accel)
        assert not np.asarray(err)[0]
        want = golden.compress_dense(data, acceleration=accel, hashlog=16)
        assert np.asarray(comp)[0, :int(clen[0])].tobytes() == want, accel


def _v6(comp, clen, out_size):
    from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (
        decompress_blocks_lockstep_v6)
    out, olen, err = decompress_blocks_lockstep_v6(comp, clen, out_size)
    return np.asarray(out), np.asarray(olen), np.asarray(err)


@pytest.mark.parametrize("bs", [4096, 65536, 262144])
def test_compiled_v6_parity(fixtures, bs):
    """v6 ring decoder parity across the block-size envelope: 4 KiB
    (small rings), 64 KiB (ring wrap + far path on real text), 256 KiB
    (the long-literal LSIC regime that regressed in BENCH_r02)."""
    base = (fixtures["mixed"] * ((bs // len(fixtures["mixed"])) + 1))[:bs]
    raws = [base, bytes(bs), fixtures["rle_short_period"][:bs],
            (fixtures["random_jpeg_scale"] * 2)[:bs]]
    comps = [bytes(golden.compress(d)) for d in raws]
    slot = F.compress_bound(bs) + 8
    comp, clen = _pack(comps, slot)
    out, olen, err = _v6(comp, clen, bs)
    for j, data in enumerate(raws):
        assert not err[j], j
        assert olen[j] == len(data), j
        assert out[j, :olen[j]].tobytes() == data, j


def _mutate(comp: bytes, rng) -> bytes:
    """Random single-point corruption strategies used by the fuzz test."""
    b = bytearray(comp)
    mode = rng.integers(0, 6)
    if mode == 0 and len(b) > 2:          # flip a random byte
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
    elif mode == 1:                        # truncate
        b = b[:int(rng.integers(1, len(b)))]
    elif mode == 2:                        # huge literal length chain
        b = bytearray([0xF0]) + b"\xff" * int(rng.integers(4, 64)) + b
    elif mode == 3 and len(b) > 4:         # zero an offset
        b[3] = 0
        b[4] = 0
    elif mode == 4 and len(b) > 4:         # huge offset (beyond output)
        b[3] = 0xFF
        b[4] = 0xFF
    else:                                  # garbage tail
        b = b + bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    return bytes(b)


def make_mutants(bases, rng, count: int, slot: int):
    """`count` corrupted/adversarial streams (round-4 scaled fuzz pool):
    single-point mutations plus bit flips, mid-stream surgery, stream
    splices, and pure-noise streams, all clipped to `slot`."""
    muts = []
    while len(muts) < count:
        base = bytearray(bases[int(rng.integers(0, len(bases)))])
        mode = int(rng.integers(0, 10))
        if mode < 5:
            m = _mutate(bytes(base), rng)
        elif mode == 5 and len(base) > 1:  # single bit flip
            i = int(rng.integers(0, len(base)))
            base[i] ^= 1 << int(rng.integers(0, 8))
            m = bytes(base)
        elif mode == 6 and len(base) > 8:  # mid-stream LSIC injection
            i = int(rng.integers(1, len(base) - 1))
            m = bytes(base[:i]) + b"\xff" * int(rng.integers(1, 32)) \
                + bytes(base[i:])
        elif mode == 7:                    # splice two streams
            other = bases[int(rng.integers(0, len(bases)))]
            i = int(rng.integers(0, len(base)))
            j = int(rng.integers(0, len(other)))
            m = bytes(base[:i]) + bytes(other[j:])
        elif mode == 8:                    # pure noise
            m = bytes(rng.integers(0, 256, size=int(rng.integers(1, 512)),
                                   dtype=np.uint8))
        else:                              # offset surgery mid-stream
            i = int(rng.integers(0, max(1, len(base) - 2)))
            base[i:i + 2] = int(rng.integers(0, 65536)).to_bytes(2, "little")
            m = bytes(base)
        if len(m) == 0:
            m = b"\x00"
        muts.append(m[:slot])
    return muts


def test_compiled_v6_fuzz_at_scale(fixtures):
    """2048 corrupted streams through the compiled v6 decoder in one
    batch (16 lockstep groups): STRICT bidirectional err equivalence
    with golden.decompress — every kernel-accepted stream must match
    golden's bytes, and every golden-accepted stream must be accepted
    (the round-3 verdict item 8 scale-up). liblz4 is the third
    implementation: when BOTH accept, bytes must agree. On malformed
    corners the verdicts legitimately diverge BOTH ways: liblz4 rejects
    some end-of-block shapes the reference decoder accepts, and liblz4
    silently ACCEPTS offset-0 matches (it copies unwritten bytes; the
    spec calls a 0 offset corruption and lz4e_decompress.c:62-460 — our
    contract — rejects it). Divergences are counted, bounded, and the
    byte agreement on mutual accepts stays strict."""
    from lz4_sgori_tpu.utils import oracle

    rng = np.random.default_rng(0xC0FFEE)
    bases = [bytes(golden.compress(fixtures[n][:BS]))
             for n in ("text_small", "zeros_4k", "rle_period3",
                       "random_4k", "structured", "mixed")]
    slot = F.compress_bound(BS) + 8
    muts = make_mutants(bases, rng, 2048, slot)
    comp, clen = _pack(muts, slot)
    out, olen, err = _v6(comp, clen, BS)
    n_acc = n_rej = n_liblz4_stricter = n_we_stricter = 0
    for j, m in enumerate(muts):
        try:
            want = golden.decompress(m, BS)
            ok_ref = True
        except ValueError:
            ok_ref = False
        assert bool(err[j]) == (not ok_ref), \
            f"mutant {j}: kernel err={bool(err[j])} golden ok={ok_ref}"
        lz_ok, lz_out = None, None
        if oracle.available():
            try:
                lz_out = oracle.decompress(m, BS)
                lz_ok = True
            except ValueError:
                lz_ok = False
        if ok_ref:
            n_acc += 1
            assert olen[j] == len(want), j
            assert out[j, :olen[j]].tobytes() == want, j
            if lz_ok:
                assert lz_out == want, j
            elif lz_ok is False:
                n_liblz4_stricter += 1
        else:
            n_rej += 1
            n_we_stricter += int(lz_ok is True)
    # the pool must exercise both verdicts heavily; cross-implementation
    # divergence on malformed streams stays a rare corner
    assert n_acc >= 64 and n_rej >= 512, (n_acc, n_rej)
    assert n_we_stricter + n_liblz4_stricter <= n_rej // 8, \
        (n_we_stricter, n_liblz4_stricter)


def test_compiled_v6_malformed_fuzz(fixtures):
    """Compiled v6 on corrupt streams: must flag err or decode to exactly
    what the golden safe decoder produces — never crash the worker,
    never write out of bounds (only observable compiled)."""
    rng = np.random.default_rng(0xFADE)
    base = bytes(golden.compress(fixtures["text_small"][:BS]))
    muts = [_mutate(base, rng) for _ in range(48)]
    slot = F.compress_bound(BS) + 8
    muts = [m[:slot] for m in muts]
    comp, clen = _pack(muts, slot)
    out, olen, err = _v6(comp, clen, BS)
    for j, m in enumerate(muts):
        try:
            want = golden.decompress(m, BS)
            ok_ref = True
        except ValueError:
            ok_ref = False
        if err[j]:
            continue
        assert ok_ref, f"mutant {j}: kernel accepted, golden rejected"
        assert olen[j] == len(want)
        assert out[j, :olen[j]].tobytes() == want
    assert err.any()


def test_compiled_production_roundtrip_64k(fixtures):
    """enc3 -> v6 cross-engine round trip on the compiled artifacts."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    data = fixtures["mixed"][:65536]
    raw, rlen = _pack([data], 65536)
    comp, clen, err = compress_blocks_lockstep_enc3(raw, rlen, 65536)
    assert not np.asarray(err)[0]
    slot = F.compress_bound(65536) + 8
    padded = np.zeros((1, slot), np.uint8)
    padded[0, :comp.shape[1]] = np.asarray(comp)[0]
    out, olen, err2 = _v6(padded, np.asarray(clen), 65536)
    assert not err2[0]
    assert out[0, :len(data)].tobytes() == data


def test_compiled_enc3_deep_parity(fixtures):
    """depth=3 (match_depth) mode: compiled parity vs compress_deep."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    names = ["text_small", "rle_period3", "structured", "random_4k"]
    raws = [fixtures[n][:BS] for n in names]
    raw, rlen = _pack(raws, BS)
    comp, clen, err = compress_blocks_lockstep_enc3(raw, rlen, BS, depth=3)
    comp, clen, err = np.asarray(comp), np.asarray(clen), np.asarray(err)
    for j, data in enumerate(raws):
        assert not err[j], names[j]
        want = golden.compress_deep(data)
        assert comp[j, :clen[j]].tobytes() == want, names[j]


def test_compiled_write_pipeline_sharded_big_blocks(fixtures):
    """The full sharded write pipeline (compress -> decode-verify ->
    psum stats) at a >64 KiB block size on REAL hardware: the round-3
    verdict's jittability gap — the old >64 KiB encode path did host
    splicing (np.asarray under trace) and failed exactly here. The seg
    engine is fully traced, so this compiles and runs under
    jit+shard_map on the TPU mesh."""
    from jax.sharding import Mesh
    from lz4_sgori_tpu.parallel.dist import (stats_totals,
                                             write_pipeline_sharded)

    bs = 131072
    base = (fixtures["mixed"] * ((bs // len(fixtures["mixed"])) + 1))
    raws = [base[k:k + bs] for k in (0, 37)] + [base[:bs - 999]]
    raws.append(bytes(bs))
    raw, rlen = _pack(raws, bs)
    mesh = Mesh(np.array(jax.devices()[:1]), ("blocks",))
    comp, clen, ok, stats = write_pipeline_sharded(
        raw, rlen, bs, mesh, axis="blocks")
    ok = np.asarray(ok)
    assert ok.all(), ok
    total, failed, raw_b, comp_b = stats_totals(stats)
    assert total == len(raws) and failed == 0
    assert raw_b == sum(len(r) for r in raws)
    # the compressed stream must also decode with liblz4
    from lz4_sgori_tpu.utils import oracle
    if oracle.available():
        comp_np, clen_np = np.asarray(comp), np.asarray(clen)
        for j, r in enumerate(raws):
            got = oracle.decompress(comp_np[j, :clen_np[j]].tobytes(),
                                    len(r))
            assert got == r, j



def test_compiled_enc3_depth5_parity(fixtures):
    """depth=5 (match_depth >= 4) mode: compiled parity vs
    compress_deep(depth=5) — the dense_gaps2 second chain tape fed by
    the gaps2-only pass-1 invocation."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    names = ["text_small", "rle_period3", "structured", "random_4k"]
    raws = [fixtures[n][:BS] for n in names]
    raw, rlen = _pack(raws, BS)
    comp, clen, err = compress_blocks_lockstep_enc3(raw, rlen, BS, depth=5)
    comp, clen, err = np.asarray(comp), np.asarray(clen), np.asarray(err)
    for j, data in enumerate(raws):
        assert not err[j], names[j]
        want = golden.compress_deep(data, depth=5)
        assert comp[j, :clen[j]].tobytes() == want, names[j]



def test_compiled_seg_big_deep_parity(fixtures):
    """Big-block (128 KiB) seg engine at depth 3 vs the golden
    piecewise-deep oracle (round-4 advisor item 2: the big-block deep
    path previously had no parity test; only depth 1 ran)."""
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)
    from lz4_sgori_tpu.ops.routing import seg_for

    bs = 131072
    base = (fixtures["mixed"] * ((bs // len(fixtures["mixed"])) + 1))
    raws = [base[:bs], base[13:13 + bs], bytes(bs),
            fixtures["text_large"][:bs]]
    raw, rlen = _pack(raws, bs)
    comp, clen, err = compress_blocks_lockstep_seg(
        raw, rlen, bs, seg=seg_for(bs), depth=3)
    comp, clen, err = np.asarray(comp), np.asarray(clen), np.asarray(err)
    for j, data in enumerate(raws):
        assert not err[j], j
        want = golden.compress_dense_seg_big(data, bs, depth=3)
        assert comp[j, :clen[j]].tobytes() == want, j


def test_compiled_v8_512k_parity_and_fuzz(fixtures):
    """v8 HBM-tape decoder at 512 KiB compiled on hardware: parity on a
    compressibility spectrum + malformed-mutant fuzz (round-4 advisor
    item 1: the >256 KiB default decode path had no hardware suite)."""
    from lz4_sgori_tpu.ops.pallas.lockstep_v8 import (
        decompress_blocks_lockstep_v8)

    bs = 512 * 1024
    base = (fixtures["mixed"] * ((bs // len(fixtures["mixed"])) + 1))
    rng = np.random.RandomState(23)
    raws = [base[:bs], bytes(bs),
            rng.randint(0, 256, bs).astype(np.uint8).tobytes(),
            (fixtures["text_large"]
             * ((bs // len(fixtures["text_large"])) + 1))[:bs],
            base[:bs - 1333], b""]
    comps = [golden.compress(r) for r in raws]
    # malformed mutants of the first compressed stream
    muts = []
    for k in range(64):
        m = bytearray(comps[0])
        pos = rng.randint(0, len(m))
        m[pos] = (m[pos] + 1 + rng.randint(0, 255)) % 256
        muts.append(bytes(m))
    allc = comps + muts
    comp, clen = _pack(allc, max(len(c) for c in allc) + 8)
    out, out_len, err = decompress_blocks_lockstep_v8(
        comp, clen, bs, sr=512, unroll=4, transfers=1)
    out = np.asarray(out)
    err = np.asarray(err)
    for j, r in enumerate(raws):
        assert not err[j], f"spectrum {j}"
        assert int(out_len[j]) == len(r), f"spectrum {j}"
        assert bytes(out[j, :len(r)]) == r, f"spectrum {j}"
    # mutants: err flag must equal golden's verdict; valid decodes must
    # be byte-identical
    for k, m in enumerate(muts):
        j = len(raws) + k
        try:
            want = golden.decompress(m, bs)
            ok = True
        except golden.DecodeError:
            ok = False
        assert bool(err[j]) == (not ok), f"mutant {k}"
        if ok:
            assert int(out_len[j]) == len(want), f"mutant {k}"
            assert bytes(out[j, :len(want)]) == want, f"mutant {k}"
