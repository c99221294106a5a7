"""On-TPU probe: in-kernel bitonic sort of an (N,128) int32 array along
sublanes (each lane sorted independently).

This is the enc3 pass-1 engine candidate: dense hash-table candidates
(golden.dense_candidates) are exactly "previous same-hash13 position",
which a sort by key = hash13<<16|pos answers with one neighbor read —
no per-query table walk. The walk costs ~3 vector ops per query per
64-row band (117 ms per 8 MiB group measured); the sort is ~10 vector
ops x log^2(N)/2 stages over the whole array.

Usage: python tools/sort_probe.py [logN] [reps]
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


def _iota_rows(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)


def bitonic_stages(n: int):
    """(j, k) stage list for a full ascending bitonic sort of n = 2^m."""
    logn = n.bit_length() - 1
    return [(j, k) for j in range(logn) for k in range(j, -1, -1)]


def sort_stage(x, j: int, k: int, iota):
    """One compare-exchange stage: distance 2^k, run direction from bit
    j+1 of the row index. One roll for the partner fetch, one for the
    send-back; everything else elementwise."""
    n = x.shape[0]
    dist = 1 << k
    fwd = jnp.roll(x, n - dist, axis=0)         # row i reads x[i+dist]
    mnf = jnp.minimum(x, fwd)
    mxf = jnp.maximum(x, fwd)
    dirbit = (iota >> (j + 1)) & 1              # 1 = descending run
    keepf = jnp.where(dirbit == 0, mnf, mxf)    # value for bit-0 rows
    sendf = jnp.where(dirbit == 0, mxf, mnf)    # value for bit-1 rows
    bit0 = (iota & dist) == 0
    return jnp.where(bit0, keepf, jnp.roll(sendf, dist, axis=0))


def _sort_kernel(x_ref, out_ref):
    n = x_ref.shape[1]
    iota = _iota_rows(n)
    x = x_ref[0]
    for j, k in bitonic_stages(n):
        x = sort_stage(x, j, k, iota)
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=())
def device_sort(x):
    n = x.shape[0]
    return pl.pallas_call(
        _sort_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, n, LANES), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, n, LANES), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, n, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x[None])[0]


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << logn
    rng = np.random.default_rng(7)
    # keys shaped like the enc3 use: hash13<<16 | pos16, all positive
    x_np = ((rng.integers(0, 8192, (n, LANES)) << 16)
            | rng.integers(0, 65536, (n, LANES))).astype(np.int32)
    dev = jax.devices()[0]
    print(f"[sort] ({n},128) int32, device {dev}", flush=True)
    x = jax.device_put(x_np, dev)

    t0 = time.perf_counter()
    y = device_sort(x)
    s = int(jnp.sum(y[0] + y[-1]))
    print(f"[sort] compile+first {time.perf_counter() - t0:.1f}s (s={s})",
          flush=True)
    y_np = np.asarray(y)
    want = np.sort(x_np, axis=0)
    ok = np.array_equal(y_np, want)
    print(f"[sort] correct: {ok}", flush=True)
    assert ok

    def run_n(c):
        acc = None
        for _ in range(c):
            yy = device_sort(x)
            ss = jnp.sum(yy[0]) + jnp.sum(yy[-1])
            acc = ss if acc is None else acc + ss
        return int(acc)

    run_n(1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(reps + 1)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / reps)
    mb = n * LANES * 4 / 1e6
    print(f"[sort] best {best * 1e3:.3f} ms for {mb:.0f} MB "
          f"({len(bitonic_stages(n))} stages, "
          f"{best * 1e6 / len(bitonic_stages(n)):.2f} us/stage)", flush=True)


if __name__ == "__main__":
    main()
