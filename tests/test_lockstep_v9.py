"""v9 chained lockstep decoder: interpret-mode parity.

Each lane decodes a CHAIN of blocks back-to-back (the makespan engine —
see docs/Performance.md round-4 "lane chaining" and tools/chain_sim.py).
Checks: per-block byte/len parity with golden across chain transitions
(short and empty blocks leave mid-chain output gaps), snake-deal
permutation round-trip, and per-block error-lane parity with
golden.DecodeError semantics (lz4e_decompress.c:62-460) — an errored
block must not poison the NEXT block in the same lane.
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden


def _pack(payloads, width=None):
    width = width or -(-(max(len(c) for c in payloads) + 8) // 32) * 32
    comp = np.zeros((len(payloads), width), np.uint8)
    clen = np.zeros(len(payloads), np.int32)
    for j, c in enumerate(payloads):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


@pytest.mark.slow
def test_v9_chain_parity():
    from lz4_sgori_tpu.ops.pallas.lockstep_v9 import (
        decompress_blocks_lockstep_v9)
    rng = np.random.RandomState(5)
    out_size = 2048
    period = bytes(rng.randint(0, 256, 700, np.int64).astype(np.uint8))
    blocks = [
        bytes(out_size),                                     # RLE offset-1
        (b"the quick brown fox " * 200)[:out_size],
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (period * 4)[:out_size],                             # far matches
        b"ab" * (out_size // 2),
        bytes(range(256)) * 8,
        b"z" * 1037,                          # short: mid-chain output gap
        b"",                                  # empty chain slot
    ]
    comp, clen = _pack([golden.compress(b) for b in blocks])
    for sort in (False, True):
        out, out_len, err = decompress_blocks_lockstep_v9(
            comp, clen, out_size, chain=2, sr=64, interpret=True,
            sort=sort)
        out = np.asarray(out)
        for j, b in enumerate(blocks):
            assert not bool(err[j]), f"sort={sort} block {j}"
            assert int(out_len[j]) == len(b), f"sort={sort} block {j}"
            assert bytes(out[j, :len(b)]) == b, f"sort={sort} block {j}"


@pytest.mark.slow
def test_v9_malformed_mid_chain():
    from lz4_sgori_tpu.ops.pallas.lockstep_v9 import (
        decompress_blocks_lockstep_v9)
    out_size = 1024
    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        golden.compress(b"x" * 640),      # valid block AFTER an error
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond block-local out
        b"\x1f",                          # truncated LSIC
        b"\x12AB\x01\x00" + b"\xff" * 6,  # match LSIC runs off the end
        golden.compress(bytes(range(256)) * 4),
        golden.compress(b"hello world " * 50),
    ]
    comp, clen = _pack(cases)
    out, out_len, err = decompress_blocks_lockstep_v9(
        comp, clen, out_size, chain=2, sr=64, interpret=True, sort=False)
    err = np.asarray(err)
    out = np.asarray(out)
    for j, c in enumerate(cases):
        try:
            want_out = golden.decompress(bytes(c), out_size)
            want = False
        except golden.DecodeError:
            want = True
            want_out = None
        assert bool(err[j]) == want, f"case {j}"
        if not want:
            assert int(out_len[j]) == len(want_out), f"case {j}"
            assert bytes(out[j, :len(want_out)]) == want_out, f"case {j}"


def test_v9_quick_smoke():
    """Default-lane representative chain-transition case (full spectrum
    in the slow lane)."""
    from lz4_sgori_tpu.ops.pallas.lockstep_v9 import (
        decompress_blocks_lockstep_v9)
    out_size = 1024
    blocks = [b"the quick brown fox " * 51 + b"um" * 2,
              bytes(out_size), b"z" * 700, b""]
    blocks = [b[:out_size] for b in blocks]
    comp, clen = _pack([golden.compress(b) for b in blocks])
    out, out_len, err = decompress_blocks_lockstep_v9(
        comp, clen, out_size, chain=2, sr=64, interpret=True, sort=False)
    out = np.asarray(out)
    for j, b in enumerate(blocks):
        assert not bool(err[j]) and int(out_len[j]) == len(b)
        assert bytes(out[j, :len(b)]) == b
