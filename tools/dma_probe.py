"""On-TPU probe: per-lane DMA issue cost (the enc4 window-refill design).

Pattern under test: a (1,128) vector of per-lane row indices is staged
to SMEM; a fori over lanes reads each index as a scalar and issues an
async copy of a contiguous row-slice from an HBM-resident block-major
tape into a per-lane staging row; all copies are then waited and the
staging block transposed. If issue+wait costs <= ~300 ns/lane, per-lane
windows can replace the span-bound banded walks (each src byte copied
once per window pass instead of scanned ~100x).

Usage: python tools/dma_probe.py [nlanes] [rows_per_dma]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/lz4j_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LANES = 128


def _kernel(idx_ref, hbm_ref, out_ref, stage, sem, *, W: int,
            NL: int, REPS: int):
    def rep(r, carry):
        def issue(onr, carry2):
            line = onr
            row0 = idx_ref[0, line] + r * 128  # 128-aligned minor slice
            cp = pltpu.make_async_copy(
                hbm_ref.at[line, pl.ds(row0, W)],
                stage.at[line, pl.ds(0, W)],
                sem.at[line])
            cp.start()
            return carry2

        jax.lax.fori_loop(0, NL, issue, 0)

        def wait(onr, carry2):
            pltpu.make_async_copy(
                hbm_ref.at[onr, pl.ds(0, W)],
                stage.at[onr, pl.ds(0, W)],
                sem.at[onr]).wait()
            return carry2

        jax.lax.fori_loop(0, NL, wait, 0)
        return carry + stage[0, 0]

    acc = jax.lax.fori_loop(0, REPS, rep, jnp.int32(0))
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("W", "NL", "REPS"))
def run(idx, hbm, W: int, NL: int, REPS: int):
    return pl.pallas_call(
        functools.partial(_kernel, W=W, NL=NL, REPS=REPS),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((LANES, 1024), jnp.int32),
            pltpu.SemaphoreType.DMA((LANES,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, hbm)


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rng = np.random.default_rng(5)
    hbm = jnp.asarray(rng.integers(0, 1 << 30, (LANES, 16384), np.int64)
                      .astype(np.int32))
    idx = jnp.asarray((rng.integers(0, 64, (1, LANES), np.int64) * 128)
                      .astype(np.int32))
    dev = jax.devices()[0]
    print(f"[dma] device {dev}, {nl} lanes x {w} rows/DMA", flush=True)

    t0 = time.perf_counter()
    REPS = 64
    s = int(run(idx, hbm, w, nl, REPS)[0, 0])
    print(f"[dma] compile+first {time.perf_counter() - t0:.1f}s ({s})",
          flush=True)

    def go(k):
        acc = 0
        for _ in range(k):
            acc += int(run(idx, hbm, w, nl, REPS)[0, 0])
        return acc

    go(1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        go(1)
        t1 = time.perf_counter()
        go(9)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
    per_rep = best / REPS
    print(f"[dma] {per_rep * 1e6:.2f} us per {nl}-DMA round "
          f"({per_rep / nl * 1e9:.0f} ns per issue+wait, "
          f"{nl * w * 4 / per_rep / 1e9:.1f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
