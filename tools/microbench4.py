"""Microbench: K-batched hash-table scans + banded ref extracts (v5 design).

Sizes the encoder probe-batching rewrite and the v4 decoder's banded
scans on the real chip:

  1. K-get: gather K per-lane hash rows from a (8192,128) int32 table in
     one select-scan pass, K in {1,4,8,16} — does batching amortize?
  2. K-put: merged ordered overwrite of K (hash,val) pairs in one pass.
  3. Banded ref extract: extract_bytes_banded over a (16384,128) VMEM ref
     at controlled cross-lane slab spans {1,4,16,64,128} — cost vs span.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench4.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4j_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas.lockstep_v4 import extract_bytes_banded

L = 128
TROWS = 8192


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


def bench_pair(make, n_lo, n_hi, label, per=1):
    f_lo = make(n_lo)
    f_hi = make(n_hi)
    best = float("inf")
    for _ in range(3):
        t_lo, _ = timed(*f_lo)
        t_hi, _ = timed(*f_hi)
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    log(f"{label}: {best * 1e9 / per:.1f} ns")
    return best / per


def _iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, L), 0)


# ---- 1/2: K-batched table gets and puts over (TROWS, L) ----
#
# Get formulation: bands are BAND-aligned, so the row matching hash h
# lands at h & (BAND-1) in a select-accumulated (BAND,L) register; one
# final sublane reduce per k instead of one per band.

BAND_T = 512


def kget_kernel(seed_ref, o_ref, *, reps, K, puts: bool):
    z = seed_ref[...] * 0

    def body(r, carry):
        tbl, acc = carry
        hs = [((acc * (2 * k + 1) + r * 977 + seed_ref[...] * k)
               * jnp.int32(-1640531535)) >> 19 & (TROWS - 1)
              for k in range(K)]
        accs = [jnp.broadcast_to(z, (BAND_T, L)) for _ in range(K)]
        for b in range(TROWS // BAND_T):
            slab = tbl[b * BAND_T:(b + 1) * BAND_T]
            ii = _iota(BAND_T) + b * BAND_T
            for k in range(K):
                m = ii == jnp.broadcast_to(hs[k], (BAND_T, L))
                accs[k] = jnp.where(m, slab, accs[k])
        gets = [jnp.sum(a, axis=0, keepdims=True) for a in accs]
        if puts:
            ii = _iota(TROWS)
            for k in range(K):
                m = ii == jnp.broadcast_to(hs[k], (TROWS, L))
                tbl = jnp.where(m, jnp.broadcast_to(acc + k, (TROWS, L)),
                                tbl)
        acc2 = acc
        for k in range(K):
            acc2 = acc2 + gets[k]
        return tbl, acc2 & 0xFFFF

    tbl0 = jnp.broadcast_to(seed_ref[...], (TROWS, L))
    _, acc = jax.lax.fori_loop(0, reps, body, (tbl0, z))
    o_ref[...] = acc


def make_kget(K, puts):
    def mk(reps):
        f = pl.pallas_call(
            functools.partial(kget_kernel, reps=reps, K=K, puts=puts),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        seed = jnp.arange(L, dtype=jnp.int32).reshape(1, L)
        return (jax.jit(lambda s: [f(s)]), seed)
    return mk


# ---- 3: banded ref extract vs span ----

def banded_kernel(tape_ref, pos_ref, o_ref, *, reps, R):
    acc = pos_ref[...] * 0

    def body(r, acc):
        pos = (pos_ref[...] + (acc & 63)) & (R * 4 - 256)
        w = extract_bytes_banded(tape_ref, None, pos, 26, R)
        return (acc + jnp.sum(w, axis=0, keepdims=True)) & 0xFFFF

    acc = jax.lax.fori_loop(0, reps, body, acc)
    o_ref[...] = acc


def make_banded(R, span_rows):
    def mk(reps):
        f = pl.pallas_call(
            functools.partial(banded_kernel, reps=reps, R=R),
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        rng = np.random.default_rng(5)
        tape = jnp.asarray(rng.integers(0, 1 << 30, (R, L)), jnp.int32)
        pos = jnp.asarray(rng.integers(0, max(span_rows * 4, 1), (1, L)),
                          jnp.int32)
        return (jax.jit(lambda t, p: [f(t, p)]), tape, pos)
    return mk


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    for K in (1, 4, 8, 16):
        bench_pair(make_kget(K, False), 16, 64,
                   f"K-get over ({TROWS},{L}), K={K}", per=1)
    for K in (1, 8, 16):
        bench_pair(make_kget(K, True), 16, 64,
                   f"K-get + K-put over ({TROWS},{L}), K={K}", per=1)
    for span in (1, 4, 16, 64, 128):
        bench_pair(make_banded(16384, span * 64), 64, 256,
                   f"banded 26-word extract, (16384,{L}) ref, span={span} slabs")


if __name__ == "__main__":
    main()
