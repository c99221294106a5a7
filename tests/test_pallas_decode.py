"""Pallas decode kernel (interpreter mode on CPU): parity with golden.

The kernel's compiled path is exercised on real TPU hardware by bench.py;
here the interpreter validates the exact same program — byte reads from
the SMEM word mirror, windowed roll copies, and the periodic-pattern
overlap path — against the golden oracle.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import format as F, golden
from lz4_sgori_tpu.ops.pallas import decompress_blocks_pallas

BS = 4096


def _pack(comps):
    slot = F.compress_bound(BS) + 8
    comp = np.zeros((len(comps), slot), np.uint8)
    clen = np.zeros(len(comps), np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def _check(cases):
    comp, clen = _pack([golden.compress(d) for d in cases])
    out, olen, err = decompress_blocks_pallas(comp, clen, BS, interpret=True)
    out, olen, err = np.asarray(out), np.asarray(olen), np.asarray(err)
    for j, want in enumerate(cases):
        assert not err[j], f"case {j}: unexpected error"
        assert olen[j] == len(want), f"case {j}: len {olen[j]} != {len(want)}"
        assert out[j, :olen[j]].tobytes() == want, f"case {j}: bytes differ"


def test_compressibility_spectrum(fixtures):
    _check([
        b"", b"A", b"hello world!",
        fixtures["zeros_4k"],
        fixtures["text_small"][:BS],
        fixtures["random_4k"],
        fixtures["mixed"][:BS],
    ])


def test_overlap_periods():
    # every period class the pattern path must handle, incl. 127/128 edges
    cases = []
    for p in [1, 2, 3, 5, 7, 17, 63, 64, 127, 128, 129, 255]:
        cases.append((bytes(range(p % 256)) * (3000 // max(p, 1) + 2))[:3000])
    _check(cases)


def test_long_literal_and_match_lsic():
    rng = np.random.default_rng(3)
    cases = [
        rng.integers(0, 256, 300, dtype=np.uint8).tobytes() + bytes(3700),
        bytes(4096),
        rng.integers(0, 256, 4000, dtype=np.uint8).tobytes(),
    ]
    _check(cases)


def test_malformed_flags_error():
    bad = [b"", b"\xff", b"\x10", b"\x14a\x00",
           b"\x04abcd\x00\x00\x00", b"\x04abcd\xff\xff\x00"]
    comp, clen = _pack(bad)
    out, olen, err = decompress_blocks_pallas(comp, clen, BS, interpret=True)
    assert np.asarray(err).all()


def test_matches_xla_decoder(fixtures):
    from lz4_sgori_tpu.ops.decode import _decompress_blocks_impl
    cases = [fixtures["text_small"][:BS], fixtures["zeros_4k"],
             fixtures["rle_period3"][:BS], fixtures["random_4k"]]
    comp, clen = _pack([golden.compress(d) for d in cases])
    o1, l1, e1 = decompress_blocks_pallas(comp, clen, BS, interpret=True)
    o2, l2, e2 = _decompress_blocks_impl(comp, clen, BS)
    assert (np.asarray(l1) == np.asarray(l2)).all()
    assert (np.asarray(e1) != 0).tolist() == np.asarray(e2).tolist()
    for j in range(len(cases)):
        n = int(np.asarray(l1)[j])
        assert np.asarray(o1)[j, :n].tobytes() == \
            np.asarray(o2)[j, :n].tobytes()
