"""Microbenchmarks for the lane-lockstep sequential codec design (v3).

Measures, inside Pallas kernels on the real chip, the primitives the
lockstep engine is built from:

  1. per-lane word gather: masked reduce over (R, 128) int32 columns with
     per-lane row indices, R in {1024, 4096, 8192, 16384}
  2. per-lane word scatter: masked where-write, same shapes
  3. per-lane variable shift of an (8, 128) FIFO (3-stage bitroll)
  4. a ~30-op universal-step state loop on (1/8, 128) vectors
  5. VMEM scratch capacity probe at lockstep working-set sizes

Method: register-carried fori bodies with runtime repeat counts; cost from
repeat-count differencing (min of 3), forced by scalar-sum fetches.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench3.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4j_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def timed(fn, *args):
    outs = fn(*args)
    s = sum(int(jnp.sum(o.astype(jnp.int32))) for o in outs) & 0xFFFF
    t0 = time.perf_counter()
    outs = fn(*args)
    s += sum(int(jnp.sum(o.astype(jnp.int32))) for o in outs) & 0xFFFF
    dt = time.perf_counter() - t0
    return dt, s


def bench_pair(make, n_lo, n_hi, label, per_label="iter"):
    f_lo = make(n_lo)
    f_hi = make(n_hi)
    best = float("inf")
    for _ in range(3):
        t_lo, _ = timed(*f_lo)
        t_hi, _ = timed(*f_hi)
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    log(f"{label}: {best * 1e9:.1f} ns/{per_label}")
    return best


# --- 1+2: gather/scatter masked ops over (R, 128) ---

def make_gather(R):
    def kern(reps_ref, tape_ref, out_ref):
        reps = reps_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)

        def body(i, carry):
            idx, acc = carry
            # per-lane row indices walk with different strides
            v = jnp.sum(jnp.where(rows == idx, tape_ref[:, :], 0),
                        axis=0, keepdims=True)
            acc = acc + v
            idx = (idx + jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) % 7 + 1) % R
            return idx, acc

        idx0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % R
        acc0 = jnp.zeros((1, 128), jnp.int32)
        _, acc = jax.lax.fori_loop(0, reps, body, (idx0, acc0))
        out_ref[0:1, :] = acc

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(tape, reps: int):
        return [pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((R, 128), lambda b, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((8, 128), lambda b, *_: (0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[],
            ),
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        )(jnp.array([reps], jnp.int32), tape)[0]]

    def mk(n):
        tape = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128) & 255
        return (lambda t: run(t, n)), tape
    return mk


def make_scatter(R):
    def kern(reps_ref, out_ref):
        reps = reps_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)

        def body(i, idx):
            v = jnp.broadcast_to(idx + i, (R, 128))
            out_ref[:, :] = jnp.where(rows == idx, v, out_ref[:, :])
            return (idx + jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) % 5 + 1) % R

        idx0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % R
        jax.lax.fori_loop(0, reps, body, idx0)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(reps: int):
        return [pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[],
                out_specs=[pl.BlockSpec((R, 128), lambda b, *_: (0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[],
            ),
            out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.int32)],
        )(jnp.array([reps], jnp.int32))[0][:8]]

    def mk(n):
        return (lambda: run(n)),
    return mk


# --- 3: per-lane variable shift of an (8,128) FIFO ---

def make_fifo():
    def kern(reps_ref, out_ref):
        reps = reps_ref[0]

        def body(i, carry):
            fifo, sh = carry
            # 3-stage bitroll: shift each lane's column down by sh[lane]
            cur = fifo
            for bit in range(3):
                k = 1 << bit
                rolled = pltpu.roll(cur, k, 0)
                cur = jnp.where((sh & k) != 0, rolled, cur)
            sh = (sh + 1) & 7
            return cur + 1, sh

        fifo0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sh0 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) & 7
        fifo, _ = jax.lax.fori_loop(0, reps, body, (fifo0, sh0))
        out_ref[:, :] = fifo

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(reps: int):
        return [pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[],
                out_specs=[pl.BlockSpec((8, 128), lambda b, *_: (0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[],
            ),
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        )(jnp.array([reps], jnp.int32))[0]]

    def mk(n):
        return (lambda: run(n)),
    return mk


# --- 4: universal-step state loop (~30 small vector ops) ---

def make_state():
    def kern(reps_ref, out_ref):
        reps = reps_ref[0]

        def body(i, st):
            a, b, c, d = st
            # ~30 chained small ops across (1,128) vectors
            e = (a + b) ^ c
            f = jnp.where(d > 0, e, a)
            g = (f >> 3) + (b & 255)
            h = jnp.minimum(g, c) | (a << 1)
            a2 = jnp.where((h & 1) != 0, a + 1, a)
            b2 = (b + g) & 0xFFFF
            c2 = jnp.maximum(c - 1, h & 7)
            d2 = d ^ (e + f)
            e2 = (a2 * 3 + b2) & 0xFFFFF
            f2 = jnp.where(c2 > d2, e2, f)
            g2 = g + (f2 >> 2)
            h2 = h ^ g2
            a3 = a2 + (h2 & 3)
            b3 = jnp.where(b2 < e2, b2 + 7, b2)
            c3 = c2 | (a3 & 1)
            d3 = d2 + g2
            return a3, b3, c3, d3

        z = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        st = (z, z + 1, z + 2, z + 3)
        a, b, c, d = jax.lax.fori_loop(0, reps, body, st)
        out_ref[0:1, :] = a + b + c + d

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(reps: int):
        return [pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[],
                out_specs=[pl.BlockSpec((8, 128), lambda b, *_: (0, 0),
                                        memory_space=pltpu.VMEM)],
                scratch_shapes=[],
            ),
            out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        )(jnp.array([reps], jnp.int32))[0]]

    def mk(n):
        return (lambda: run(n)),
    return mk


# --- 5: VMEM capacity probe ---

def probe_vmem(rows):
    def kern(out_ref, big, big2):
        big[0:8, :] = jnp.ones((8, 128), jnp.int32)
        big2[0:8, :] = jnp.ones((8, 128), jnp.int32)
        out_ref[:, :] = big[0:8, :] + big2[0:8, :]

    try:
        r = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            out_specs=pl.BlockSpec((8, 128), lambda *_: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.int32),
                            pltpu.VMEM((4096, 128), jnp.int32)],
        )()
        _ = int(jnp.sum(r))
        log(f"VMEM probe rows={rows} (+4096 ring): OK "
            f"({(rows + 4096) * 128 * 4 / 1e6:.1f} MB)")
        return True
    except Exception as e:
        log(f"VMEM probe rows={rows}: FAIL {str(e)[:120]}")
        return False


def main():
    log(f"device {jax.devices()[0]}")
    for R in (1024, 4096, 8192, 16384):
        mk = make_gather(R)
        reps = max(20_000, 40_000_000 // R)
        bench_pair(mk, reps, reps * 5, f"per-lane gather (R={R})")
    for R in (1024, 4096, 16384):
        mk = make_scatter(R)
        reps = max(20_000, 40_000_000 // R)
        bench_pair(mk, reps, reps * 5, f"per-lane scatter (R={R})")
    bench_pair(make_fifo(), 200_000, 1_000_000, "fifo 3-stage bitroll (8,128)")
    bench_pair(make_state(), 200_000, 1_000_000, "30-op state step")
    for rows in (16384, 20480, 24576, 32768, 49152, 90112):
        if not probe_vmem(rows):
            break


if __name__ == "__main__":
    main()
