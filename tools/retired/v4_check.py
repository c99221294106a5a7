"""CPU (interpret-mode) parity check of the v4 lockstep decoder."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops.pallas.lockstep_v4 import decompress_blocks_lockstep_v4


def run_case(blocks, out_size, sr=512):
    comps = [golden.compress(b) for b in blocks]
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp = np.zeros((len(blocks), slot), np.uint8)
    clen = np.zeros(len(blocks), np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    out, out_len, err = decompress_blocks_lockstep_v4(
        comp, clen, out_size, sr=sr, interpret=True)
    out = np.asarray(out)
    ok = 0
    for j, b in enumerate(blocks):
        assert not bool(err[j]), f"block {j}: unexpected err"
        assert int(out_len[j]) == len(b), \
            f"block {j}: len {int(out_len[j])} != {len(b)}"
        got = bytes(out[j, :len(b)])
        if got != b:
            d = next(i for i in range(len(b)) if got[i] != b[i])
            raise AssertionError(f"block {j}: first mismatch at {d}")
        ok += 1
    print(f"  {ok}/{len(blocks)} blocks exact (out_size={out_size}, sr={sr})")


def run_malformed(out_size=4096):
    cases = [
        b"\xf0" + b"A" * 10,              # literal run past input
        b"\x00\xff",                      # trailing garbage / bad offset
        b"\x10A\x00\x00",                 # offset zero
        b"\x10A\x50\x00",                 # offset beyond output
        b"\x1f",                          # truncated LSIC
        b"\x12AB\x01\x00" + b"\xff" * 6,  # match LSIC runs off the end
    ]
    comp = np.zeros((len(cases), 64), np.uint8)
    clen = np.zeros(len(cases), np.int32)
    for j, c in enumerate(cases):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    out, out_len, err = decompress_blocks_lockstep_v4(
        comp, clen, out_size, interpret=True)
    for j, c in enumerate(cases):
        try:
            golden.decompress(c, out_size)
            want_err = False
        except golden.DecodeError:
            want_err = True
        assert bool(err[j]) == want_err, \
            f"malformed case {j}: err={bool(err[j])} want {want_err}"
    print(f"  {len(cases)}/{len(cases)} malformed cases match golden")


def main():
    rng = np.random.default_rng(11)
    fixtures = [
        b"",
        b"x",
        b"hello world " * 4,
        bytes(512),
        bytes(rng.integers(0, 256, 512, dtype=np.uint8)),
        b"abcabcabcabc" * 40,
        bytes(4096),
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        (b"the quick brown fox jumps over the lazy dog. " * 120)[:4096],
        bytes(rng.integers(0, 4, 4096, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 2000, dtype=np.uint8)) + bytes(2096),
        bytes([1, 2, 3, 4]) * 1024,
    ]
    # intra-group variety (sorting shuffles lanes; exercise the inverse)
    blocks = (fixtures * 12)[:130]
    run_case(blocks, 4096)
    run_case(blocks[:8], 4096, sr=128)
    run_malformed()

    big = [
        (b"the quick brown fox. " * 4000)[:65536],
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),
        bytes(65536),
        bytes(rng.integers(0, 3, 65536, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 30000, dtype=np.uint8)) + bytes(35536),
    ]
    run_case(big, 65536, sr=1024)
    print("ALL OK")


if __name__ == "__main__":
    main()
