"""v4 lockstep decoder: interpret-mode parity + malformed-stream contract.

The v4 engine is the default TPU decode path (ops/decode.py dispatch).
Interpret mode is slow, so this file keeps to two small launches: one
mixed-content parity batch (routed through the public dispatcher) and one
malformed batch hitting the error lanes (golden.DecodeError semantics,
lz4e_decompress.c:62-460).
"""

import numpy as np
import pytest

from lz4_sgori_tpu import golden


def _pack(payloads, slot_align=32):
    slot = -(-(max(len(c) for c in payloads) + 8) // slot_align) * slot_align
    comp = np.zeros((len(payloads), slot), np.uint8)
    clen = np.zeros(len(payloads), np.int32)
    for j, c in enumerate(payloads):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def test_v4_parity_via_dispatcher():
    rng = np.random.RandomState(3)
    out_size = 768
    blocks = [
        bytes(out_size),                                     # RLE offset-1
        (b"the quick brown fox " * 64)[:out_size],           # text-ish
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (bytes(rng.randint(65, 70, 48).astype(np.uint8)) * 20)[:out_size],
        b"ab" * (out_size // 2),                             # offset-2 runs
        bytes(range(256)) * 3,                               # literals only
    ]
    comp, clen = _pack([golden.compress(b) for b in blocks])
    from lz4_sgori_tpu.ops.decode import decompress_blocks_device
    out, out_len, err = decompress_blocks_device(
        comp, clen, out_size, impl="lockstep")
    out = np.asarray(out)
    for j, b in enumerate(blocks):
        assert not bool(err[j]), f"block {j}"
        assert int(out_len[j]) == len(b)
        assert bytes(out[j, :len(b)]) == b, f"block {j}"


def test_v4_malformed_sets_err():
    from lz4_sgori_tpu.ops.pallas.lockstep_v4 import (
        decompress_blocks_lockstep_v4)
    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",                          # truncated LSIC
        b"\x12AB\x01\x00" + b"\xff" * 6,  # match LSIC runs off the end
        golden.compress(b"x" * 64),       # control: valid block
    ]
    comp, clen = _pack(cases, slot_align=64)
    out, out_len, err = decompress_blocks_lockstep_v4(
        comp, clen, 64, sr=64, interpret=True)
    err = np.asarray(err)
    for j, c in enumerate(cases[:-1]):
        with pytest.raises(golden.DecodeError):
            golden.decompress(c, 64)
        assert bool(err[j]), f"case {j} should flag err"
    assert not bool(err[-1])
    assert bytes(np.asarray(out)[-1]) == b"x" * 64
