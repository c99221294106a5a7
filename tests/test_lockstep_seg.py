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
    """Default-lane representative: 3 blocks, depth 1 + 3, small cases —
    the exhaustive spectrum runs in the slow lane (LZ4J_SLOW_TESTS=1)."""
    rng = np.random.default_rng(7)
    raw, rlen = _mkbatch([
        (LOREM * 40)[:BS],
        bytes(512) + rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
        + (b"ab" * 300)[:600],
        b"abcabcabcabcabcabc",
    ])
    _check(raw, rlen, depth=1)
    _check(raw, rlen, depth=3)
