"""Isolate enc2 pass 1: run only the sweep on hardware, dump the cand
tape, and compare with golden.dense_candidates.

Usage: python tools/enc2_p1_check.py [block_idx] [block_kib]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

INTERP = len(sys.argv) > 3 and sys.argv[3] == "1"
if INTERP:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from __graft_entry__ import _synth_corpus
from lz4_sgori_tpu import golden
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas import lockstep_enc2 as E2


def _kernel(src_ref, n_ref, cand_out, tbl_ref, *, T1: int):
    n = n_ref[0]
    tbl_ref[...] = E2._bcast(n * 0, E2.TROWS)

    def sweep(r, c):
        E2._sweep_round(r, src_ref, tbl_ref, cand_out, 0, n)
        return c

    jax.lax.fori_loop(0, T1, sweep, 0)


def main():
    bi = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024
    data = _synth_corpus(128 * bs)
    raw, rlen = split_blocks(data, bs)
    blk = raw[bi, :rlen[bi]].tobytes()

    raw1 = np.zeros((128, bs), np.uint8)
    raw1[0, :len(blk)] = np.frombuffer(blk, np.uint8)
    tapes = LK.pack_tapes(jnp.asarray(raw1),
                          jnp.asarray([len(blk)] + [0] * 127, jnp.int32))
    sw = tapes.shape[0] + 8
    sw = -(-sw // 64) * 64
    tapes = jnp.pad(tapes, ((0, sw - tapes.shape[0]), (0, 0)))
    t1 = -(-bs // E2.K1)
    cpr = -(-(t1 * (E2.K1 // 2)) // 64) * 64
    nlane = jnp.asarray([[len(blk)] + [0] * 127], jnp.int32)

    cand = pl.pallas_call(
        functools.partial(_kernel, T1=t1),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, sw, 128), lambda g: (0, 0, 0)),
                  pl.BlockSpec((1, 128), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((cpr, 128), lambda g: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cpr, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((E2.TROWS, 128), jnp.int32)],
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(tapes[None], nlane)

    got = np.asarray(cand)[:, 0]
    d16 = np.zeros(bs, np.int32)
    d16[0::2] = got[:bs // 2] & 0xFFFF
    d16[1::2] = (got[:bs // 2] >> 16) & 0xFFFF
    want = np.asarray(golden.dense_candidates(blk), np.int32)
    want = np.pad(want, (0, bs - len(want)))
    bad = np.nonzero(d16 != want)[0]
    print(f"cand mismatches: {len(bad)} / {bs}", flush=True)
    for p in bad[:10]:
        print(f"  pos {p}: kernel d16={d16[p]} oracle={want[p]}")
    if len(bad) == 0:
        print("PASS1 EXACT")


if __name__ == "__main__":
    main()
