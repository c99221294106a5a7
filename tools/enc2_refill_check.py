"""Isolate the enc2 cand-window refill on hardware: build the cand tape
with pass 1 (proven exact), then run a series of banded refills at
per-lane bases and dump the windows; compare against the tape.

Usage: python tools/enc2_refill_check.py [block_kib] [interpret]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

INTERP = len(sys.argv) > 2 and sys.argv[2] == "1"
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
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas import lockstep_enc2 as E2
from lz4_sgori_tpu.ops.pallas.lockstep_v4 import extract_rows_banded

NW = 16  # refills to dump


def _kernel(src_ref, n_ref, base_ref, win_out, cand_ref, tbl_ref, *,
            T1: int, CPR: int):
    n = n_ref[0]
    tbl_ref[...] = E2._bcast(n * 0, E2.TROWS)

    def sweep(r, c):
        E2._sweep_round(r, src_ref, tbl_ref, cand_ref, 0, n)
        return c

    jax.lax.fori_loop(0, T1, sweep, 0)

    blog = 6
    for w in range(NW):
        crb = base_ref[pl.ds(w, 1), :]
        c_lo = jnp.min(crb) >> blog
        c_hi = jnp.max(crb) >> blog
        win = extract_rows_banded(cand_ref, None, crb, E2.LCP, CPR,
                                  bounds=(c_lo, c_hi))
        win_out[pl.ds(w * E2.LCP, E2.LCP), :] = win


def main():
    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    data = _synth_corpus(128 * bs)
    raw, rlen = split_blocks(data, bs)
    tapes = LK.pack_tapes(jnp.asarray(raw[:128]),
                          jnp.asarray(rlen[:128], jnp.int32))
    sw = -(-(tapes.shape[0] + 8) // 64) * 64
    tapes = jnp.pad(tapes, ((0, sw - tapes.shape[0]), (0, 0)))
    t1 = -(-bs // E2.K1)
    cpr = -(-(t1 * (E2.K1 // 2)) // 64) * 64
    nlane = jnp.asarray(rlen[:128], jnp.int32)[None]

    # per-lane spread bases, including near-tape-end rows
    rng = np.random.RandomState(5)
    bases = np.zeros((NW, 128), np.int32)
    for w in range(NW):
        lo = rng.randint(0, max(cpr - 200, 1))
        bases[w] = lo + rng.randint(0, 160, 128)
    bases[-1] = cpr - E2.LCP + rng.randint(0, E2.LCP, 128)  # tail clamp

    wins, cand = pl.pallas_call(
        functools.partial(_kernel, T1=t1, CPR=cpr),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, sw, 128), lambda g: (0, 0, 0)),
                  pl.BlockSpec((1, 128), lambda g: (0, 0)),
                  pl.BlockSpec((NW, 128), lambda g: (0, 0))],
        out_specs=[pl.BlockSpec((NW * E2.LCP, 128), lambda g: (0, 0)),
                   pl.BlockSpec((cpr, 128), lambda g: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((NW * E2.LCP, 128), jnp.int32),
                   jax.ShapeDtypeStruct((cpr, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((E2.TROWS, 128), jnp.int32)],
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(tapes[None], nlane, jnp.asarray(bases))

    wins = np.asarray(wins)
    cand = np.asarray(cand)
    bad = 0
    for w in range(NW):
        for L in range(128):
            b = bases[w, L]
            want = np.zeros(E2.LCP, np.int32)
            hi = min(b + E2.LCP, cpr)
            if b < cpr:
                want[:hi - b] = cand[b:hi, L]
            got = wins[w * E2.LCP:(w + 1) * E2.LCP, L]
            if not np.array_equal(got, want):
                if bad < 5:
                    dd = np.nonzero(got != want)[0][0]
                    print(f"w={w} lane={L} base={b}: row {dd}: "
                          f"got {got[dd]:#x} want {want[dd]:#x}")
                bad += 1
    print(f"refill windows bad: {bad} / {NW * 128}")
    if bad == 0:
        print("REFILL EXACT")


if __name__ == "__main__":
    main()
