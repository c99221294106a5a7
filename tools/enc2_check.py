"""CPU (interpret-mode) parity check of the enc2 dense encoder."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from lz4_sgori_tpu import golden
from lz4_sgori_tpu.ops.pallas.lockstep_enc2 import (
    compress_blocks_lockstep_enc2)


def run_case(blocks, bs, accel=1):
    raw = np.zeros((len(blocks), bs), np.uint8)
    rlen = np.zeros(len(blocks), np.int32)
    for j, b in enumerate(blocks):
        raw[j, :len(b)] = np.frombuffer(b, np.uint8)
        rlen[j] = len(b)
    comp, clen, err = compress_blocks_lockstep_enc2(
        raw, rlen, bs, accel=accel, interpret=True)
    comp = np.asarray(comp)
    for j, b in enumerate(blocks):
        want = golden.compress_dense(b, acceleration=accel)
        assert not bool(err[j]), f"block {j}: err"
        got = bytes(comp[j, :int(clen[j])])
        if got != want:
            d = next((i for i in range(min(len(got), len(want)))
                      if got[i] != want[i]), min(len(got), len(want)))
            raise AssertionError(
                f"block {j}: {len(got)}B vs {len(want)}B, first diff {d}")
        back = golden.decompress(got, len(b))
        assert back == b, f"block {j}: decode mismatch"
    print(f"  {len(blocks)}/{len(blocks)} blocks exact "
          f"(bs={bs}, accel={accel})", flush=True)


def main():
    rng = np.random.default_rng(23)
    bs = 4096
    period = bytes(rng.integers(0, 256, 700, dtype=np.uint8))
    blocks = [
        bytes(bs),                                     # zeros: RLE + EXT
        (b"the quick brown fox " * 300)[:bs],          # text
        bytes(rng.integers(0, 256, bs, dtype=np.uint8)),   # random: FLIT
        (period * 6)[:bs],                             # offset-700 matches
        bytes(rng.integers(0, 256, 2000, dtype=np.uint8)) + bytes(2096),
        b"ab" * (bs // 2),                             # offset-2
        bytes(range(256)) * 16,                        # offset-256
        ((b"x" * 300 + bytes(rng.integers(0, 256, 100, dtype=np.uint8)))
         * 11)[:bs],                                   # long lit streams
        b"z" * 37,
        b"",
        bytes(rng.integers(0, 3, bs, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 1000, dtype=np.uint8)) * 4,  # far d
    ]
    run_case(blocks, bs)
    run_case(blocks, bs, accel=4)
    # >128-block group boundary + ragged lengths
    many = (blocks * 12)[:130]
    run_case(many, bs)
    print("ALL OK")


if __name__ == "__main__":
    main()
