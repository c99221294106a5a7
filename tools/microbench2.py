"""Round-2 primitive microbenchmarks for the vectorized decode/encode design.

Measures the per-op cost of the building blocks the v2 kernels lean on
(one-hot MXU row-gathers, per-byte lane extraction, bit-decomposition rolls,
masked sublane mul-reduce lookups, scalar SMEM walks, fori overhead, raw VPU
and MXU rates, cumsum/transpose support), each as its own Pallas kernel with
a *runtime* repeat count so one compiled program yields per-iteration cost by
differencing two repeat counts (remote compiles are minutes each — no
recompiling per measurement).

Run serially on the one TPU:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench2.py
"""

from __future__ import annotations

import functools
import os
import time
import traceback

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/lz4j_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")


def _harness(body, extra_in=(), name="probe"):
    """pallas_call wrapper: scalar-prefetched repeat count R drives
    fori_loop(body); returns a jitted fn(R, *arrays) -> f32 scalar."""

    def kernel(r_ref, *refs):
        out_ref = refs[-1]
        ins = refs[:-1]
        out_ref[...] = jnp.zeros_like(out_ref)

        def step(i, carry):
            return body(i, carry, ins, out_ref)

        acc = jax.lax.fori_loop(0, r_ref[0], step, jnp.float32(0.0))
        out_ref[...] = out_ref[...] + acc  # broadcast: no scalar VMEM store

    @functools.partial(jax.jit, static_argnames=())
    def run(r, *arrays):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in arrays],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray([r], jnp.int32), *arrays)

    return run


def _time(fn, r, *arrays):
    out = fn(r, *arrays)
    s = float(jnp.sum(out))  # scalar fetch forces completion through axon
    t0 = time.perf_counter()
    s += float(jnp.sum(fn(r, *arrays)))
    t1 = time.perf_counter()
    return t1 - t0, s


def measure(name, fn, r_lo, r_hi, *arrays, per_iter_items=1):
    try:
        t_lo, _ = _time(fn, r_lo, *arrays)
        t_lo2, _ = _time(fn, r_lo, *arrays)
        t_hi, _ = _time(fn, r_hi, *arrays)
        t_hi2, _ = _time(fn, r_hi, *arrays)
        t_lo, t_hi = min(t_lo, t_lo2), min(t_hi, t_hi2)
        per = (t_hi - t_lo) / (r_hi - r_lo)
        print(f"{name}: {per * 1e6:.3f} us/iter "
              f"({per * 1e9 / per_iter_items:.3f} ns/item), "
              f"t({r_lo})={t_lo * 1e3:.1f}ms t({r_hi})={t_hi * 1e3:.1f}ms",
              flush=True)
        return per
    except Exception as e:  # noqa: BLE001 - probe failures are data
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        traceback.print_exc()
        return None


def lcg(x):
    return (x * jnp.int32(1664525) + jnp.int32(1013904223))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = np.random.default_rng(0)

    # --- L: raw VPU rate: 16 chained adds/xors on (512,128) i32 ---
    def body_vpu(i, carry, ins, out):
        x = ins[0][...] + i
        for _ in range(8):
            x = (x ^ (x + 1)) + (x >> 1)
        out[0:8, :] = x[0:8, :].astype(jnp.float32)
        return carry + 1.0

    a512 = jnp.asarray(key.integers(0, 1 << 20, (512, 128)), jnp.int32)
    measure("vpu_16ops_512x128 (1M ops/iter)", _harness(body_vpu),
            16, 256, a512, per_iter_items=512 * 128 * 16)

    # --- H: raw MXU rate: (512,512)bf16 @ (512,128)bf16 (33.5M MACs) ---
    def body_mxu(i, carry, ins, out):
        a, b = ins[0][...], ins[1][...]
        # ((i & 1) + 1) varies per iteration: the matmul cannot be hoisted
        a = a * ((i & 1) + 1).astype(a.dtype)
        c = jnp.dot(a, b, preferred_element_type=jnp.float32)
        out[0:8, :] = c[0:8, :]
        return carry + 1.0

    mA = jnp.asarray(key.normal(size=(512, 512)), jnp.bfloat16)
    mB = jnp.asarray(key.normal(size=(512, 128)), jnp.bfloat16)
    measure("mxu_512x512x128_bf16 (33.5M MAC/iter)", _harness(body_mxu),
            16, 256, mA, mB, per_iter_items=512 * 512 * 128)

    # f32 variant
    measure("mxu_512x512x128_f32", _harness(body_mxu),
            16, 256, mA.astype(jnp.float32), mB.astype(jnp.float32),
            per_iter_items=512 * 512 * 128)

    # --- A: one-hot row-gather: ids (2048,1) -> onehot (2048,512)bf16 @
    # data (512,128)bf16; the match/literal copy engine ---
    def body_gather(i, carry, ins, out):
        ids, data = ins[0], ins[1]
        idv = (lcg(ids[...] + i) >> 7) & 511  # (2048, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 1)
        oh = (cols == idv).astype(jnp.bfloat16)
        g = jnp.dot(oh, data[...], preferred_element_type=jnp.float32)
        out[0:8, :] = g[0:8, :]
        return carry + 1.0

    ids = jnp.asarray(key.integers(0, 1 << 20, (2048, 1)), jnp.int32)
    data_bf = jnp.asarray(key.normal(size=(512, 128)), jnp.bfloat16)
    measure("onehot_rowgather_2048q_512rows", _harness(body_gather),
            8, 64, ids, data_bf, per_iter_items=2048)

    # --- B: per-row lane extract: (2048,128) f32 + idx (2048,1) ---
    def body_extract(i, carry, ins, out):
        g, ids = ins[0], ins[1]
        idv = (lcg(ids[...] + i)) & 127
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
        m = (cols == idv).astype(jnp.float32)
        v = jnp.sum(g[...] * m, axis=1, keepdims=True)  # (2048, 1)
        out[0:8, :] = v[0:8, 0:1] + jax.lax.broadcast_in_dim(
            jnp.float32(0), (8, 128), ())
        return carry + 1.0

    g2048 = jnp.asarray(key.normal(size=(2048, 128)), jnp.float32)
    measure("lane_extract_2048x128", _harness(body_extract),
            8, 64, g2048, ids, per_iter_items=2048)

    # --- C: per-row variable roll via 7 static rolls + select (512,128) ---
    def body_bitroll(i, carry, ins, out):
        x, amt = ins[0][...], ins[1][...]
        av = (lcg(amt + i)) & 127  # (512, 1)
        for j in range(7):
            sh = 1 << j
            r = pltpu.roll(x, 128 - sh, 1)  # = shift left by sh (lanes)
            x = jnp.where((av & sh) != 0, r, x)
        out[0:8, :] = x[0:8, :].astype(jnp.float32)
        return carry + 1.0

    amt = jnp.asarray(key.integers(0, 128, (512, 1)), jnp.int32)
    measure("bitroll7_512x128", _harness(body_bitroll),
            16, 128, a512, amt, per_iter_items=512)

    # --- D: masked sublane mul-reduce lookup: table (128,512), per-lane
    # row idx (1,512) -> (1,512) [the sweep's E-table lookup] ---
    def body_vlookup(i, carry, ins, out):
        tbl, idx = ins[0][...], ins[1][...]
        idv = (lcg(idx + i)) & 127  # (1, 512)
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 512), 0)
        m = (rows == idv).astype(jnp.int32)
        v = jnp.sum(tbl * m, axis=0, keepdims=True)  # (1, 512)
        out[0, 0:128] = v[0, 0:128].astype(jnp.float32)
        return carry + 1.0

    tbl = jnp.asarray(key.integers(0, 1 << 20, (128, 512)), jnp.int32)
    idx1 = jnp.asarray(key.integers(0, 128, (1, 512)), jnp.int32)
    measure("sublane_lookup_128x512", _harness(body_vlookup),
            16, 128, tbl, idx1, per_iter_items=512)

    # --- E: scalar SMEM walk: dependent loads from a scalar-prefetched
    # table (the cross-segment chain walk in the v2 parse) ---
    def walk_kernel(r_ref, tbl_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

        def step(j, x):
            return tbl_ref[x & 511] + x + 1

        x = jax.lax.fori_loop(0, r_ref[0], step, jnp.int32(1))
        out_ref[...] = out_ref[...] + x.astype(jnp.float32)

    @jax.jit
    def run_walk(r, tblv):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            walk_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray([r], jnp.int32), tblv)

    tblv = jnp.asarray(key.integers(0, 512, (512,)), jnp.int32)
    measure("smem_scalar_walk (dependent)", run_walk, 1024, 65536, tblv)

    # --- F: fori overhead: trivial vector body on (8,128) ---
    def body_fori(i, carry, ins, out):
        out[0:8, :] = out[0:8, :] + ins[0][...].astype(jnp.float32)
        return carry + 1.0

    small = jnp.asarray(key.integers(0, 100, (8, 128)), jnp.int32)
    measure("fori_overhead_tinybody", _harness(body_fori),
            256, 4096, small)

    # --- G: dynamic-sublane vector read chain (scalar-dynamic row) ---
    def body_dynrow(i, carry, ins, out):
        x = ins[0]
        row = (i * 37) & 255
        v = x[pl.ds(row, 8), :]  # dynamic 8-row slice
        out[0:8, :] = out[0:8, :] + v.astype(jnp.float32)
        return carry + 1.0

    measure("dyn_sublane_read8_512x128", _harness(body_dynrow),
            64, 1024, a512)

    # --- I: cumsum (jnp.cumsum is unimplemented in this Pallas lowering):
    # (a) log-shift rolls along sublanes; (b) triangular MXU matmul ---
    def body_cumsum_shift(i, carry, ins, out):
        x = ins[0][...] + i
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 1), 0)
        for j in range(9):  # log2(512)
            sh = 1 << j
            r = pltpu.roll(x, sh, 0)  # rows down by sh
            x = x + jnp.where(rows >= sh, r, 0)
        out[0:8, :] = x[0:8, :].astype(jnp.float32)
        return carry + 1.0

    measure("cumsum_logshift_rows_512x128", _harness(body_cumsum_shift),
            16, 128, a512, per_iter_items=512 * 128)

    def body_cumsum_mxu(i, carry, ins, out):
        x = (ins[0][...] + i).astype(jnp.float32)  # (512, 128)
        tri = ins[1][...]  # (512, 512) lower-triangular ones f32
        c = jnp.dot(tri, x, preferred_element_type=jnp.float32)
        out[0:8, :] = c[0:8, :]
        return carry + 1.0

    tri = jnp.asarray(np.tril(np.ones((512, 512), np.float32)))
    measure("cumsum_mxu_tri_512x128", _harness(body_cumsum_mxu),
            16, 128, a512, tri, per_iter_items=512 * 128)

    # --- J: transpose support (128,512)->(512,128) ---
    def body_transpose(i, carry, ins, out):
        x = ins[0][...] + i
        t = jnp.transpose(x, (1, 0))
        out[0:8, :] = t[0:8, :].astype(jnp.float32)
        return carry + 1.0

    x128 = jnp.asarray(key.integers(0, 1 << 20, (128, 512)), jnp.int32)
    measure("transpose_128x512", _harness(body_transpose), 16, 128, x128)

    # --- K: big one-hot build alone: (2048,512) cmp (the gather's VPU side)
    def body_ohbuild(i, carry, ins, out):
        ids = ins[0]
        idv = (lcg(ids[...] + i) >> 7) & 511
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 1)
        oh = (cols == idv).astype(jnp.bfloat16)
        out[0:8, :] = oh[0:8, 0:128].astype(jnp.float32)
        return carry + 1.0

    measure("onehot_build_2048x512", _harness(body_ohbuild),
            8, 64, ids, per_iter_items=2048)

    # --- M: bounded shifted-select gather: g[p] = A[p + d[p]], d in [0,32)
    # via 32 static rolls+select on (512,128) ---
    def body_shiftsel(i, carry, ins, out):
        x, amt = ins[0][...], ins[1][...]
        d = (lcg(amt + i)) & 31  # (512, 1) per-row jump
        acc = jnp.zeros_like(x)
        for j in range(32):
            r = x if j == 0 else pltpu.roll(x, 512 - j, 0)  # rows up by j
            acc = jnp.where(d == j, r, acc)
        out[0:8, :] = acc[0:8, :].astype(jnp.float32)
        return carry + 1.0

    measure("shiftsel32_rows_512x128", _harness(body_shiftsel),
            8, 64, a512, amt, per_iter_items=512 * 128)

    print("done", flush=True)


if __name__ == "__main__":
    main()
