"""Probe Mosaic costs of G-interleave layout options for the v5 decoder.

Measures, inside one pallas kernel via repeat-count differencing:
  rot2d_g1   — v4-style per-lane rotate on (512,128), broadcast masks
  rot2d_tile — v5-style rotate on (512*G,128) with tiled (G,128) masks
  rot3d      — rotate on (512,G,128) with [None]-broadcast masks
  carry1mb   — while-loop carrying a 1 MB value unchanged (copy cost)
  place_g1   — lockstep.place on (512,128) staging
Usage: python tools/microbench5.py [G]
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
from lz4_sgori_tpu.ops.pallas import lockstep_v5 as V5

L = 128
W = 512


def timed_kernel(body_fn, n_iter_ref, x_ref, o_ref):
    x = x_ref[...]

    def body(i, c):
        return body_fn(c, i)

    r = jax.lax.fori_loop(0, n_iter_ref[0], body, x)
    o_ref[...] = r[:8]


def run_case(name, shape, body_fn, iters=(512, 8192)):
    dev = jax.devices()[0]
    x = jnp.asarray(np.random.RandomState(0).randint(
        0, 1 << 20, shape).astype(np.int32))

    @jax.jit
    def go(n):
        n2 = jnp.asarray([n], jnp.int32)
        return pl.pallas_call(
            functools.partial(timed_kernel, body_fn),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)
                      if False else pl.BlockSpec()],
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
    print(f"  {name:12s} {best * 1e9:9.1f} ns/iter", flush=True)


def main():
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"G={G}, device {jax.devices()[0]}", flush=True)

    # v4-style: (W,128) rotate, per-lane (1,128) amounts
    def rot2d_g1(c, i):
        s = (c[:1] + i) & (W - 1)
        return LK.rotate_up(c, s, W)

    run_case("rot2d_g1", (W, L), rot2d_g1)

    # v5-style: (W*G,128) rotate, tiled (G,128) masks
    def rot2d_tile(c, i):
        s = (c[:G] + i) & (W - 1)
        return V5.rotate_up_g(c, s, W, G)

    run_case("rot2d_tile", (W * G, L), rot2d_tile)

    # 3D: (W,G,128) rotate, [None]-broadcast masks
    def rot3d(c, i):
        s = (c[0] + i) & (W - 1)
        cur = c
        bit = 1
        while bit < W:
            rolled = jnp.roll(cur, W - bit, axis=0)
            cur = jnp.where(((s & bit) != 0)[None], rolled, cur)
            bit <<= 1
        return cur

    run_case("rot3d", (W, G, L), rot3d)

    # carry a multi-MB value through a loop, touching one row
    def carry(c, i):
        return jnp.concatenate([c[:1] + i, c[1:]], axis=0)

    run_case("carry2mb", (W * G, L), carry)

    # place on (W,128)
    def place1(c, i):
        stream = c[:LK.FR]
        k = (c[:1] * 0) + 40
        dst = (c[:1] + i) & (W * 4 - 256)
        return LK.place(c, stream, dst, k)

    run_case("place_g1", (W, L), place1)

    # G-interleaved place on (W*G,128) (v5)
    def placeg(c, i):
        stream = c[:LK.FR * G]
        k = (c[:G] * 0) + 40
        dst = (c[:G] + i) & (W * 4 - 256)
        return V5.place_g(c, stream, dst, k, G)

    run_case("place_gG", (W * G, L), placeg)


if __name__ == "__main__":
    main()
