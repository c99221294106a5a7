"""v8 HBM-tape lockstep decoder: interpret-mode parity + malformed
streams (round-4 advisor item 1: the >256 KiB production decode path
had no dedicated suite).

The v8 engine is the auto-dispatch target for every block size above
256 KiB (ops/routing.py); these tests pin byte/len parity with golden
and golden.DecodeError error-lane semantics (lz4e_decompress.c:62-460)
on the same case families as the other lockstep engines, sized small
enough for the CPU interpret lane. Compiled hardware coverage for
512 KiB+ blocks lives in tests/test_tpu_compiled.py.
"""

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


def test_v8_parity():
    from lz4_sgori_tpu.ops.pallas.lockstep_v8 import (
        decompress_blocks_lockstep_v8)
    rng = np.random.RandomState(11)
    out_size = 4096
    period = bytes(rng.randint(0, 256, 1500, np.int64).astype(np.uint8))
    blocks = [
        bytes(out_size),                                     # RLE offset-1
        (b"the quick brown fox " * 300)[:out_size],
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (period * 4)[:out_size],                             # far matches
        b"ab" * (out_size // 2),
        bytes(range(256)) * (out_size // 256),
        b"z" * 2037,                                         # short block
        b"",                                                 # empty block
    ]
    comp, clen = _pack([golden.compress(b) for b in blocks])
    for sort in (False, True):
        out, out_len, err = decompress_blocks_lockstep_v8(
            comp, clen, out_size, sr=512, unroll=2, transfers=1,
            interpret=True, sort=sort)
        out = np.asarray(out)
        for j, b in enumerate(blocks):
            assert not bool(err[j]), f"sort={sort} block {j}"
            assert int(out_len[j]) == len(b), f"sort={sort} block {j}"
            assert bytes(out[j, :len(b)]) == b, f"sort={sort} block {j}"


def test_v8_malformed():
    from lz4_sgori_tpu.ops.pallas.lockstep_v8 import (
        decompress_blocks_lockstep_v8)
    out_size = 2048
    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        golden.compress(b"x" * 1640),     # valid block among errors
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",                          # truncated LSIC
        b"\x12AB\x01\x00" + b"\xff" * 6,  # match LSIC runs off the end
        golden.compress(bytes(range(256)) * 8),
        golden.compress(b"hello world " * 100),
    ]
    comp, clen = _pack(cases)
    out, out_len, err = decompress_blocks_lockstep_v8(
        comp, clen, out_size, sr=512, unroll=2, transfers=1,
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
