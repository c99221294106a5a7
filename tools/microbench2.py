"""Round-2 primitive microbenchmarks for the vectorized decode/encode design.

Measures the per-op cost of the building blocks the v2 kernels lean on
(one-hot MXU row-gathers, per-byte lane extraction, bit-decomposition rolls,
masked sublane mul-reduce lookups, scalar SMEM walks, fori overhead, raw VPU
and MXU rates, cumsum/transpose formulations), each as its own Pallas kernel
with a *runtime* repeat count so one compiled program yields per-iteration
cost by differencing two repeat counts (remote compiles are minutes each —
no recompiling per measurement).

Loop state is carried in registers (vector fori carry); results are written
once at the end, so the measured cost is the body, not a VMEM RMW per
iteration.

Run serially on the one TPU:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench2.py
"""

from __future__ import annotations

import functools
import os
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4j_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")


def _harness(body):
    """body(i, acc_f32_8x128, ins) -> acc. Returns jit fn(R, *arrays)."""

    def kernel(r_ref, *refs):
        out_ref = refs[-1]
        ins = refs[:-1]

        def step(i, acc):
            return body(i, acc, ins)

        acc = jax.lax.fori_loop(
            0, r_ref[0], step, jnp.zeros((8, 128), jnp.float32))
        out_ref[...] = acc

    @jax.jit
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
    s = float(jnp.sum(out))
    t0 = time.perf_counter()
    s += float(jnp.sum(fn(r, *arrays)))
    t1 = time.perf_counter()
    return t1 - t0, s


def measure(name, fn, r_lo, r_hi, *arrays, items=1):
    try:
        best = None
        for _ in range(3):
            t_lo, _ = _time(fn, r_lo, *arrays)
            t_hi, _ = _time(fn, r_hi, *arrays)
            per = (t_hi - t_lo) / (r_hi - r_lo)
            best = per if best is None else min(best, per)
        print(f"{name}: {best * 1e6:.3f} us/iter "
              f"({best * 1e9 / items:.3f} ns/item)", flush=True)
        return best
    except Exception as e:  # noqa: BLE001 - probe failures are data
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        traceback.print_exc()
        return None


def lcg(x):
    return x * jnp.int32(1664525) + jnp.int32(1013904223)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = np.random.default_rng(0)
    a512 = jnp.asarray(key.integers(0, 1 << 20, (512, 128)), jnp.int32)

    # --- raw VPU rate: 16 chained int ops on (512,128) ---
    def body_vpu(i, acc, ins):
        x = ins[0][...] + i
        for _ in range(8):
            x = (x ^ (x + 1)) + (x >> 1)
        return acc + x[0:8, :].astype(jnp.float32)

    measure("vpu_16ops_512x128", _harness(body_vpu), 16384, 2097152, a512,
            items=512 * 128 * 16)

    # --- MXU rates ---
    def body_mxu(i, acc, ins):
        a, b = ins[0][...], ins[1][...]
        a = a * ((i & 1) + 1).astype(a.dtype)
        c = jnp.dot(a, b, preferred_element_type=jnp.float32)
        return acc + c[0:8, :]

    mA = jnp.asarray(key.normal(size=(512, 512)), jnp.bfloat16)
    mB = jnp.asarray(key.normal(size=(512, 128)), jnp.bfloat16)
    measure("mxu_512x512x128_bf16", _harness(body_mxu), 8192, 524288, mA, mB,
            items=512 * 512 * 128)
    measure("mxu_512x512x128_f32", _harness(body_mxu), 8192, 524288,
            mA.astype(jnp.float32), mB.astype(jnp.float32),
            items=512 * 512 * 128)

    # --- one-hot row-gather pipeline: ids->onehot->matmul (copy engine) ---
    def body_gather(i, acc, ins):
        ids, data = ins[0], ins[1]
        idv = (lcg(ids[...] + i) >> 7) & 511  # (2048, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 1)
        oh = (cols == idv).astype(jnp.bfloat16)
        g = jnp.dot(oh, data[...], preferred_element_type=jnp.float32)
        return acc + g[0:8, :]

    ids = jnp.asarray(key.integers(0, 1 << 20, (2048, 1)), jnp.int32)
    data_bf = jnp.asarray(key.normal(size=(512, 128)), jnp.bfloat16)
    measure("onehot_rowgather_2048q_512rows", _harness(body_gather),
            4096, 262144, ids, data_bf, items=2048)

    # --- onehot build alone ---
    def body_ohbuild(i, acc, ins):
        ids = ins[0]
        idv = (lcg(ids[...] + i) >> 7) & 511
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 512), 1)
        oh = (cols == idv).astype(jnp.bfloat16)
        return acc + oh[0:8, 0:128].astype(jnp.float32)

    measure("onehot_build_2048x512", _harness(body_ohbuild), 4096, 262144, ids,
            items=2048)

    # --- per-row lane extract: (2048,128) + idx (2048,1) -> (2048,1) ---
    def body_extract(i, acc, ins):
        g, ids = ins[0], ins[1]
        idv = lcg(ids[...] + i) & 127
        cols = jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
        m = (cols == idv).astype(jnp.float32)
        v = jnp.sum(g[...] * m, axis=1, keepdims=True)
        return acc + v[0:8, 0:1]

    g2048 = jnp.asarray(key.normal(size=(2048, 128)), jnp.float32)
    measure("lane_extract_2048x128", _harness(body_extract), 4096, 262144,
            g2048, ids, items=2048)

    # --- reduce directions on (512,128) ---
    def body_red1(i, acc, ins):
        x = ins[0][...] + i
        v = jnp.sum(x, axis=1, keepdims=True)  # lanes
        return acc + v[0:8, 0:1].astype(jnp.float32)

    measure("reduce_lanes_512x128", _harness(body_red1), 16384, 1048576, a512)

    def body_red0(i, acc, ins):
        x = ins[0][...] + i
        v = jnp.sum(x, axis=0, keepdims=True)  # sublanes
        return acc + v[0:1, 0:128].astype(jnp.float32)

    measure("reduce_sublanes_512x128", _harness(body_red0), 16384, 1048576, a512)

    # --- per-row variable LANE roll via 7 static rolls + select ---
    def body_bitroll(i, acc, ins):
        x, amt = ins[0][...], ins[1][...]
        av = lcg(amt + i) & 127
        for j in range(7):
            sh = 1 << j
            r = pltpu.roll(x, 128 - sh, 1)
            x = jnp.where((av & sh) != 0, r, x)
        return acc + x[0:8, :].astype(jnp.float32)

    amt = jnp.asarray(key.integers(0, 128, (512, 1)), jnp.int32)
    measure("bitroll7_lanes_512x128", _harness(body_bitroll), 8192, 262144,
            a512, amt, items=512)

    # --- single static sublane roll, dependent chain of 8 ---
    def body_sroll(i, acc, ins):
        x = ins[0][...] + i
        for j in range(8):
            x = x + pltpu.roll(x, 1, 0)
        return acc + x[0:8, :].astype(jnp.float32)

    measure("chained8_sublane_roll_512x128", _harness(body_sroll), 8192, 262144,
            a512, items=8)

    def body_lroll(i, acc, ins):
        x = ins[0][...] + i
        for j in range(8):
            x = x + pltpu.roll(x, 1, 1)
        return acc + x[0:8, :].astype(jnp.float32)

    measure("chained8_lane_roll_512x128", _harness(body_lroll), 8192, 262144,
            a512, items=8)

    # --- sublane (vertical) one-hot lookup: table (128,512), idx (1,512) ---
    def body_vlookup(i, acc, ins):
        tbl, idx = ins[0][...], ins[1][...]
        idv = lcg(idx + i) & 127
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 512), 0)
        m = (rows == idv).astype(jnp.int32)
        v = jnp.sum(tbl * m, axis=0, keepdims=True)
        return acc + v[0:1, 0:128].astype(jnp.float32)

    tbl = jnp.asarray(key.integers(0, 1 << 20, (128, 512)), jnp.int32)
    idx1 = jnp.asarray(key.integers(0, 128, (1, 512)), jnp.int32)
    measure("sublane_lookup_128x512", _harness(body_vlookup), 16384, 2097152,
            tbl, idx1, items=512)

    # --- scalar SMEM walk ---
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
    measure("smem_scalar_walk (dependent)", run_walk, 65536, 1 << 25, tblv)

    # --- fori overhead: near-empty body with register carry ---
    def body_fori(i, acc, ins):
        return acc + ins[0][...].astype(jnp.float32)

    small = jnp.asarray(key.integers(0, 100, (8, 128)), jnp.int32)
    measure("fori_overhead_tinybody", _harness(body_fori), 65536, 1 << 23,
            small)

    # --- dynamic-sublane vector read (scalar-dynamic row), 8 rows ---
    def body_dynrow(i, acc, ins):
        x = ins[0]
        row = (i * 37) & 255
        v = x[pl.ds(row, 8), :]
        return acc + v.astype(jnp.float32)

    measure("dyn_sublane_read8_512x128", _harness(body_dynrow), 16384, 1048576,
            a512)

    # --- static-sublane read for comparison ---
    def body_statrow(i, acc, ins):
        x = ins[0]
        v = x[8:16, :]
        return acc + (v + i).astype(jnp.float32)

    measure("static_sublane_read8_512x128", _harness(body_statrow),
            16384, 1048576, a512)

    # --- cumsum formulations ---
    def body_cumsum_shift(i, acc, ins):
        x = ins[0][...] + i
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 1), 0)
        for j in range(9):
            sh = 1 << j
            r = pltpu.roll(x, sh, 0)
            x = x + jnp.where(rows >= sh, r, 0)
        return acc + x[0:8, :].astype(jnp.float32)

    measure("cumsum_logshift_rows_512x128", _harness(body_cumsum_shift),
            2048, 65536, a512, items=512 * 128)

    def body_cumsum_mxu(i, acc, ins):
        x = (ins[0][...] + i).astype(jnp.float32)
        tri = ins[1][...]
        c = jnp.dot(tri, x, preferred_element_type=jnp.float32)
        return acc + c[0:8, :]

    tri = jnp.asarray(np.tril(np.ones((512, 512), np.float32)))
    measure("cumsum_mxu_tri_512x128", _harness(body_cumsum_mxu), 4096, 131072,
            a512, tri, items=512 * 128)

    # --- lane-axis cumsum via tri matmul from the right ---
    def body_cumsum_mxu_lane(i, acc, ins):
        x = (ins[0][...] + i).astype(jnp.float32)
        triu = ins[1][...]  # (128,128) upper-tri
        c = jnp.dot(x, triu, preferred_element_type=jnp.float32)
        return acc + c[0:8, :]

    triu = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))
    measure("cumsum_mxu_lane_512x128", _harness(body_cumsum_mxu_lane),
            2048, 65536, a512, triu, items=512 * 128)

    # --- transpose ---
    def body_transpose(i, acc, ins):
        x = ins[0][...] + i
        t = jnp.transpose(x, (1, 0))
        return acc + t[0:8, :].astype(jnp.float32)

    x128 = jnp.asarray(key.integers(0, 1 << 20, (128, 512)), jnp.int32)
    measure("transpose_128x512", _harness(body_transpose), 2048, 65536, x128)

    # --- bounded shifted-select row gather (jump table d in [0,32)) ---
    def body_shiftsel(i, acc, ins):
        x, amt = ins[0][...], ins[1][...]
        d = lcg(amt + i) & 31
        sel = jnp.zeros_like(x)
        for j in range(32):
            r = x if j == 0 else pltpu.roll(x, 512 - j, 0)
            sel = jnp.where(d == j, r, sel)
        return acc + sel[0:8, :].astype(jnp.float32)

    measure("shiftsel32_rows_512x128", _harness(body_shiftsel), 2048, 65536,
            a512, amt, items=512 * 128)

    print("done", flush=True)


if __name__ == "__main__":
    main()
