"""Pallas encode kernel (interpreter mode on CPU): byte parity with golden.

The golden encoder is byte-identical to LZ4_compress_default
(test_golden); the kernel implements the same greedy algorithm with the
same hash configuration for sub-64KiB blocks, so its output must match
byte-for-byte. The compiled path is exercised on real TPU hardware by the
bench harness."""

import numpy as np
import pytest

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops.pallas.encode_kernel import compress_blocks_pallas

BS = 4096


def _encode(cases):
    raw = np.zeros((len(cases), BS), np.uint8)
    rlen = np.zeros(len(cases), np.int32)
    for j, d in enumerate(cases):
        raw[j, :len(d)] = np.frombuffer(d, np.uint8)
        rlen[j] = len(d)
    comp, clen = compress_blocks_pallas(raw, rlen, BS, interpret=True)
    comp, clen = np.asarray(comp), np.asarray(clen)
    return [comp[j, :clen[j]].tobytes() for j in range(len(cases))]


def _check_parity(cases):
    for got, d in zip(_encode(cases), cases):
        want = golden.compress(d)
        assert got == want, (len(got), len(want))


def test_edges_and_spectrum(fixtures):
    _check_parity([
        b"", b"A", b"hello world!", b"aaaaaaaaaaaaa",
        fixtures["zeros_4k"],
        fixtures["text_small"][:BS],
        fixtures["random_4k"],
        fixtures["mixed"][:BS],
        fixtures["rle_short_period"][:BS],
        fixtures["rle_period3"][:BS],
    ])


def test_lsic_boundaries():
    rng = np.random.default_rng(9)
    incompressible = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
    _check_parity([
        incompressible,                       # long literal run (LSIC)
        incompressible + bytes(3000),         # literals then huge match
        bytes(270),                           # match len across LSIC edge
        (b"x" * 19),                          # run == RUN_MASK + few
    ])


def test_fuzz_parity():
    rng = np.random.default_rng(17)
    cases = []
    for _ in range(24):
        n = int(rng.integers(0, 600))
        alphabet = 1 << int(rng.integers(1, 5))
        cases.append(rng.integers(0, alphabet, n, dtype=np.uint8).tobytes())
    _check_parity(cases)
