"""On-TPU stage decomposition of the seg encoder (production 64 KiB path).

Usage: python tools/seg_probe.py [block_kib] [nblocks] [accel]
Env:   SEG_STAGES=pass1,cand,prep,parse,all (default) — which stages to
       time; SEG_ROUNDS=1 prints per-lane parse round counts;
       SEG_DEPTH=N depth; SEG_FAR_EVERY / SEG_NEAR_LIM forwarding.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/lz4j_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    bs_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    accel = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    depth = int(os.environ.get("SEG_DEPTH", "1"))
    stages = os.environ.get("SEG_STAGES", "pass1,cand,prep,parse,all"
                            ).split(",")
    dbg_rounds = os.environ.get("SEG_ROUNDS") == "1"
    bs = bs_kib * 1024

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    dev = jax.devices()[0]
    print(f"[seg] {nb} x {bs} blocks depth={depth} accel={accel} "
          f"device {dev}", flush=True)
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)

    kw = dict(accel=accel, depth=depth)
    fe = os.environ.get("SEG_FAR_EVERY")
    if fe:
        kw["far_every"] = int(fe)
    nl = os.environ.get("SEG_NEAR_LIM")
    if nl:
        kw["near_lim"] = int(nl)
    if os.environ.get("SEG_MLEN") == "1":
        kw["mlen"] = True
    ur = os.environ.get("SEG_UNROLL")
    if ur:
        kw["unroll"] = int(ur)
    wb = os.environ.get("SEG_WB_BAND")
    if wb:
        kw["wb_band"] = int(wb)

    from lz4_sgori_tpu.ops.routing import seg_for
    segsz = seg_for(bs) if bs > 65536 else 4096
    print(f"[seg] seg={segsz}", flush=True)

    def run(stage, n=1):
        acc = None
        for _ in range(n):
            c, cl, e = compress_blocks_lockstep_seg(
                raw_d, rlen_d, bs, seg=segsz, stage=stage,
                debug_rounds=dbg_rounds and stage == "all", **kw)
            s = jnp.sum(cl) + jnp.sum(e) + jnp.sum(c[0, :1].astype(
                jnp.int32))
            acc = s if acc is None else acc + s
        return int(acc)

    for stage in stages:
        t0 = time.perf_counter()
        run(stage)
        t1 = time.perf_counter()
        print(f"[seg] stage={stage:6s} compile+first {t1 - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(stage, 1)
            t1 = time.perf_counter()
            run(stage, 5)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 4)
        gbps = nb * bs / best / 1e9
        print(f"[seg] stage={stage:6s} {best * 1e3:8.2f} ms "
              f"({gbps:.3f} GB/s)", flush=True)

    if dbg_rounds:
        c, cl, e = compress_blocks_lockstep_seg(
            raw_d, rlen_d, bs, seg=segsz, stage="all",
            debug_rounds=True, **kw)
        # debug_rounds: err lanes carry round counts (per segment lane)
        r = np.asarray(e)
        print(f"[seg] rounds: shape {r.shape} max={r.max()} "
              f"mean={r.mean():.0f} min={r.min()}", flush=True)


if __name__ == "__main__":
    main()
