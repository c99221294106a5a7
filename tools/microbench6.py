"""Probe the encoder-v2 pass-1 primitive costs on the TPU.

Pass 1 of the dense-insertion encoder sweeps all positions in K-batches:
per round, K per-lane table GETs (random rows of an (R,128) table) and
K ordered one-hot PUTs. Measures, via repeat-count differencing:

  getK_R   — one fused pass over (R,128) serving K queries/lane
  putK_R   — K ordered one-hot insert layers over (R,128)
  extract  — lockstep.extract_rows single-query baseline
Usage: python tools/microbench6.py [K] [R]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lz4_sgori_tpu.ops.pallas import lockstep as LK

L = 128


def timed_kernel(body_fn, n_iter_ref, x_ref, o_ref):
    x = x_ref[...]

    def body(i, c):
        return body_fn(c, i)

    r = jax.lax.fori_loop(0, n_iter_ref[0], body, x)
    o_ref[...] = r[:8]


def run_case(name, shape, body_fn, iters=(256, 4096)):
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 1 << 20, shape).astype(np.int32))

    @jax.jit
    def go(n):
        n2 = jnp.asarray([n], jnp.int32)
        return pl.pallas_call(
            functools.partial(timed_kernel, body_fn),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec()],
            out_shape=jax.ShapeDtypeStruct((8,) + shape[1:], jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(n2, x)

    int(jnp.sum(go(iters[0])))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(jnp.sum(go(iters[0])))
        t1 = time.perf_counter()
        int(jnp.sum(go(iters[1])))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (iters[1] - iters[0]))
    print(f"  {name:14s} {best * 1e9:9.1f} ns/iter", flush=True)


def fused_getK(tbl, hs, R, K):
    """K per-lane queries in one pass: for each band, accumulate each
    query's row via compare+select. hs: list of K (1,128) row indices."""
    BAND = 64
    nb = R // BAND
    blog = 6
    accs = [jnp.zeros((1, L), jnp.int32) for _ in range(K)]
    ii = LK._iota_rows(BAND)
    for b in range(nb):
        seg = tbl[b * BAND:(b + 1) * BAND]
        for k in range(K):
            m = (ii + b * BAND) == LK._bcast(hs[k], BAND)
            accs[k] = accs[k] + jnp.sum(jnp.where(m, seg, 0), axis=0,
                                        keepdims=True)
    return accs


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    print(f"K={K}, R={R}, device {jax.devices()[0]}", flush=True)

    def getk(c, i):
        hs = [(c[:1] * (k + 3) + i) & (R - 1) for k in range(K)]
        accs = fused_getK(c, hs, R, K)
        out = accs[0]
        for a in accs[1:]:
            out = out ^ a
        return jnp.concatenate([out, c[1:]], axis=0)

    run_case(f"getK{K}_{R}", (R, L), getk)

    def putk(c, i):
        ii = LK._iota_rows(R)
        t = c
        for k in range(K):
            h = (c[:1] * (k + 3) + i) & (R - 1)
            m = ii == LK._bcast(h, R)
            t = jnp.where(m, LK._bcast(c[:1] + k, R), t)
        return t

    run_case(f"putK{K}_{R}", (R, L), putk)

    def extract1(c, i):
        h = (c[:1] + i) & (R - 1)
        v = LK.extract_rows(c, h, 1)
        return jnp.concatenate([v, c[1:]], axis=0)

    run_case(f"extract1_{R}", (R, L), extract1)


if __name__ == "__main__":
    main()
