"""v7 hot-ring lockstep decoder: interpret-mode parity + malformed
streams (the 16-128 KiB production band had no CPU-lane suite of its
own; hardware coverage lives in test_tpu_compiled.py)."""

import numpy as np

from lz4_sgori_tpu import golden


def _pack(payloads, width=None):
    width = width or -(-(max(len(c) for c in payloads) + 8) // 32) * 32
    comp = np.zeros((len(payloads), width), np.uint8)
    clen = np.zeros(len(payloads), np.int32)
    for j, c in enumerate(payloads):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def test_v7_parity():
    from lz4_sgori_tpu.ops.pallas.lockstep_v7 import (
        decompress_blocks_lockstep_v7)
    rng = np.random.RandomState(3)
    out_size = 4096
    period = bytes(rng.randint(0, 256, 1500, np.int64).astype(np.uint8))
    blocks = [
        bytes(out_size),
        (b"the quick brown fox " * 300)[:out_size],
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (period * 4)[:out_size],                 # far matches (> hot span)
        b"ab" * (out_size // 2),
        (b"A" * 300 + b"\xff" * 300) * 6,        # long-literal LSIC chains
        b"z" * 2037,
        b"",
    ]
    comp, clen = _pack([golden.compress(b) for b in blocks])
    out, out_len, err = decompress_blocks_lockstep_v7(
        comp, clen, out_size, sr=512, unroll=3, transfers=1,
        interpret=True, sort=True)
    out = np.asarray(out)
    for j, b in enumerate(blocks):
        assert not bool(err[j]), f"block {j}"
        assert int(out_len[j]) == len(b), f"block {j}"
        assert bytes(out[j, :len(b)]) == b, f"block {j}"


def test_v7_malformed():
    from lz4_sgori_tpu.ops.pallas.lockstep_v7 import (
        decompress_blocks_lockstep_v7)
    out_size = 2048
    cases = [
        b"\xf0" + b"A" * 10,
        golden.compress(b"x" * 1640),
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",
        b"\x12AB\x01\x00" + b"\xff" * 6,
        golden.compress(bytes(range(256)) * 8),
        b"\x0fABCDEFGHIJKLMNO",           # literal-only terminal
    ]
    comp, clen = _pack(cases)
    out, out_len, err = decompress_blocks_lockstep_v7(
        comp, clen, out_size, sr=512, unroll=3, transfers=1,
        interpret=True, sort=False)
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
