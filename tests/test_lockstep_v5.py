"""v5 group-interleaved lockstep decoder: interpret-mode parity.

One compact launch (interpret mode is slow): mixed-content blocks at
G=2 through the engine directly, plus malformed streams hitting the
error lanes (golden.DecodeError semantics, lz4e_decompress.c:62-460).
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden


def _pack(payloads, width):
    comp = np.zeros((len(payloads), width), np.uint8)
    clen = np.zeros(len(payloads), np.int32)
    for j, c in enumerate(payloads):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def test_v5_parity_and_malformed():
    from lz4_sgori_tpu.ops.pallas.lockstep_v5 import (
        decompress_blocks_lockstep_v5)
    rng = np.random.RandomState(3)
    out_size = 512
    blocks = [
        bytes(out_size),                                     # RLE offset-1
        (b"the quick brown fox " * 32)[:out_size],
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (bytes(rng.randint(65, 70, 48).astype(np.uint8)) * 20)[:out_size],
        b"ab" * (out_size // 2),                             # offset-2 runs
        bytes(range(256)) * 2,                               # literals only
        b"z" * 37,                                           # short block
        b"",                                                 # empty block
    ]
    comps = [golden.compress(b) for b in blocks]
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp, clen = _pack(comps, slot)
    out, out_len, err = decompress_blocks_lockstep_v5(
        comp, clen, out_size, sr=64, G=2, interpret=True)
    out = np.asarray(out)
    for j, b in enumerate(blocks):
        assert not bool(err[j]), f"block {j}"
        assert int(out_len[j]) == len(b)
        assert bytes(out[j, :len(b)]) == b, f"block {j}"

    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",                          # truncated LSIC
        golden.compress(b"x" * 64),       # control: valid block
    ]
    comp, clen = _pack(cases, 64)
    out, out_len, err = decompress_blocks_lockstep_v5(
        comp, clen, 64, sr=32, G=2, interpret=True)
    err = np.asarray(err)
    for j, c in enumerate(cases[:-1]):
        with pytest.raises(golden.DecodeError):
            golden.decompress(c, 64)
        assert bool(err[j]), f"case {j} should flag err"
    assert not bool(err[-1])
    assert bytes(np.asarray(out)[-1]) == b"x" * 64
