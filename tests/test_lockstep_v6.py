"""v6 ring-staging lockstep decoder: interpret-mode parity.

One compact launch (interpret mode is slow): mixed-content blocks
through the engine directly — ring wraparound, per-lane flushes, far
matches (offset > ring span), zero-pad tail contract — plus malformed
streams hitting the error lanes (golden.DecodeError semantics,
lz4e_decompress.c:62-460).
"""

import numpy as np

from lz4_sgori_tpu import golden


def _pack(payloads, width):
    comp = np.zeros((len(payloads), width), np.uint8)
    clen = np.zeros(len(payloads), np.int32)
    for j, c in enumerate(payloads):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    return comp, clen


def test_v6_parity_ring_and_far():
    from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (
        decompress_blocks_lockstep_v6)
    rng = np.random.RandomState(5)
    out_size = 2048
    period = bytes(rng.randint(0, 256, 700, np.int64).astype(np.uint8))
    blocks = [
        bytes(out_size),                                     # RLE offset-1
        (b"the quick brown fox " * 200)[:out_size],
        bytes(rng.randint(0, 256, out_size, np.int64).astype(np.uint8)),
        (period * 4)[:out_size],       # offset-700 matches: beyond the
                                       # sr=64 ring span -> far path
        b"ab" * (out_size // 2),
        bytes(range(256)) * 8,
        b"z" * 37,                                           # short block
        b"",                                                 # empty block
    ]
    comps = [golden.compress(b) for b in blocks]
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp, clen = _pack(comps, slot)
    # sr=64: the 256 B ring wraps many times per block and the offset-700
    # fixture forces committed-history far reads
    out, out_len, err = decompress_blocks_lockstep_v6(
        comp, clen, out_size, sr=64, interpret=True)
    out = np.asarray(out)
    for j, b in enumerate(blocks):
        assert not bool(err[j]), f"block {j}"
        assert int(out_len[j]) == len(b)
        assert bytes(out[j, :len(b)]) == b, f"block {j}"
        assert not out[j, len(b):].any(), f"block {j}: pad not zero"


def test_v6_malformed():
    from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (
        decompress_blocks_lockstep_v6)
    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",                          # truncated LSIC
        b"\x12AB\x01\x00" + b"\xff" * 6,  # match LSIC runs off the end
        golden.compress(b"x" * 64),       # control: valid block
    ]
    comp, clen = _pack(cases, 64)
    out, out_len, err = decompress_blocks_lockstep_v6(
        comp, clen, 64, sr=64, interpret=True)
    err = np.asarray(err)
    for j, c in enumerate(cases[:-1]):
        try:
            golden.decompress(c, 64)
            want = False
        except golden.DecodeError:
            want = True
        assert bool(err[j]) == want, f"case {j}"
    assert not bool(err[-1])
    assert bytes(np.asarray(out)[-1, :64]) == b"x" * 64
