"""Segmented-lane encoder (enc3 seg mode) parity vs golden.compress_dense_seg.

Interpret-mode (CPU) coverage; the compiled-TPU lane re-runs parity on
hardware (test_tpu_compiled.py). Small blocks + a restricted window keep
the per-lane tapes interpret-sized; the semantics under test (per-lane
limits, headerless first sequences, owner-header assembly, catch-up
floors) are size-independent.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
    compress_blocks_lockstep_seg,
)

BS, SEG, W = 4096, 512, 4096

LOREM = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed "
         b"do eiusmod tempor incididunt ut labore et dolore magna aliqua. ")


def _mkbatch(blocks):
    raw = np.zeros((len(blocks), BS), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        raw[i, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[i] = len(b)
    return raw, rlen


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    return _mkbatch([
        (LOREM * 40)[:BS],
        bytes(1000) + rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        + (b"ab" * 600)[:1096],
        rng.integers(0, 256, BS, dtype=np.uint8).tobytes(),
        (LOREM * 3)[:300],
        b"",
        b"abcabcabcabcabcabc",
        bytes(BS),                       # all zeros: RLE + long runs
        (b"x" * 511 + b"Q") * 8,         # matches crossing seg starts
    ])


def _check(raw, rlen, depth=1, accel=1):
    comp, clen, err = compress_blocks_lockstep_seg(
        raw, rlen, BS, seg=SEG, window=W, interpret=True, depth=depth,
        accel=accel)
    comp, clen, err = map(np.asarray, (comp, clen, err))
    assert not err.any(), err.tolist()
    for i in range(raw.shape[0]):
        b = raw[i, :rlen[i]].tobytes()
        g = golden.compress_dense_seg(b, seg=SEG, window=W, depth=depth,
                                      acceleration=accel)
        got = comp[i, :clen[i]].tobytes()
        assert got == g, (i, len(got), len(g))
        assert golden.decompress(got, len(b)) == b, i


@pytest.mark.slow
def test_greedy_parity(batch):
    _check(*batch)


@pytest.mark.slow
def test_deep_parity(batch):
    _check(*batch, depth=3)


@pytest.mark.slow
def test_accel_parity(batch):
    _check(*batch, accel=8)


def test_seg_quick_smoke():
    """Default-lane representative: 3 blocks, greedy depth — the
    exhaustive spectrum and the deep modes run in the slow lane
    (LZ4J_SLOW_TESTS=1) and on hardware (test_tpu_compiled)."""
    rng = np.random.default_rng(7)
    raw, rlen = _mkbatch([
        (LOREM * 40)[:BS],
        bytes(512) + rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
        + (b"ab" * 300)[:600],
        b"abcabcabcabcabcabc",
    ])
    _check(raw, rlen, depth=1)


def test_asm_kernel_per_group_path():
    """The per-group (grid=1) assembly invocation used by shapes whose
    double-buffered grid exceeds VMEM (256 KiB blocks on hardware) —
    exercised here at small shape via force_single."""
    import jax.numpy as jnp
    from lz4_sgori_tpu.ops.pallas import lockstep as LK
    from lz4_sgori_tpu.ops.pallas.asm_seg import assemble_segments

    rng = np.random.default_rng(9)
    LANES = 128
    nseg, ocw, hw, raww = 2, 16, 8, 80
    swr = nseg * ocw + nseg * hw + raww
    out_rows = 64
    ng = 2
    # random piece contents packed per lane: streams at slots, hdrs,
    # raw tail source; plan = lengths + tail offsets
    src = rng.integers(-2**31, 2**31 - 1, (ng, swr, LANES),
                       dtype=np.int64).astype(np.int32)
    plan = np.zeros((ng, 8, LANES), np.int32)
    sl = rng.integers(0, 4 * ocw - 4, (ng, nseg, LANES))
    hl = rng.integers(0, 4 * hw - 4, (ng, nseg, LANES))
    tl = rng.integers(0, 32, (ng, nseg, LANES))
    le = rng.integers(0, 64, (ng, nseg, LANES))
    for k in range(nseg):
        plan[:, 3 * k] = sl[:, k]
        plan[:, 3 * k + 1] = hl[:, k]
        plan[:, 3 * k + 2] = tl[:, k]
        plan[:, 3 * nseg + k] = 4 * (nseg * ocw + nseg * hw) + le[:, k]
    for force in (False, True):
        out, olen = assemble_segments(
            jnp.asarray(src), jnp.asarray(plan), nseg=nseg, ocw=ocw,
            hw=hw, raww=raww, out_rows=out_rows, interpret=True,
            force_single=force)
        out = np.asarray(out)
        olen = np.asarray(olen).reshape(ng, LANES)
        # reference concat on the host
        srcb = src.transpose(0, 2, 1).astype(np.uint32)
        srcbytes = srcb.view(np.uint8) if srcb.flags["C_CONTIGUOUS"] \
            else np.ascontiguousarray(srcb).view(np.uint8)
        srcbytes = srcbytes.reshape(ng, LANES, swr * 4)
        outb = np.ascontiguousarray(
            out.transpose(0, 2, 1).astype(np.uint32)).view(
            np.uint8).reshape(ng, LANES, out_rows * 4)
        for g in range(ng):
            for L in range(0, LANES, 17):
                want = b""
                for k in range(nseg):
                    o = 4 * k * ocw
                    want += srcbytes[g, L, o:o + sl[g, k, L]].tobytes()
                    o = 4 * (nseg * ocw + k * hw)
                    want += srcbytes[g, L, o:o + hl[g, k, L]].tobytes()
                    o = plan[g, 3 * nseg + k, L]
                    want += srcbytes[g, L, o:o + tl[g, k, L]].tobytes()
                assert olen[g, L] == len(want), (force, g, L)
                assert outb[g, L, :len(want)].tobytes() == want, \
                    (force, g, L)


def test_seg_asm_fallback_parity():
    """Shapes whose source column misaligns the asm kernel's banded
    walk (8 KiB blocks, 4 KiB segments: SWR % 64 != 0) take the
    vmapped-DUS assembly fallback; parity vs golden.compress_dense_seg."""
    bs, sg = 8192, 4096
    rng = np.random.default_rng(12)
    blocks = [
        (LOREM * 80)[:bs],
        bytes(2048) + rng.integers(0, 256, 2048,
                                   dtype=np.uint8).tobytes()
        + (b"ab" * 2048)[:4096],
        b"xyz" * 1000,
    ]
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for i, b in enumerate(blocks):
        raw[i, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[i] = len(b)
    comp, clen, err = compress_blocks_lockstep_seg(
        raw, rlen, bs, seg=sg, window=bs, interpret=True)
    comp, clen, err = map(np.asarray, (comp, clen, err))
    assert not err.any()
    for i, b in enumerate(blocks):
        g = golden.compress_dense_seg(b, seg=sg, window=bs)
        assert comp[i, :clen[i]].tobytes() == g, i
