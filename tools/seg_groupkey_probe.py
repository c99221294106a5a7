"""Oracle-grouping probe for the seg encoder: does grouping segments by
their TRUE parse-round counts (instead of candidate density) move the
64 KiB encode? (The decode engines' nseq lesson — docs/Performance.md
round-4 cost hints — applied to the encoder's 48%-idle lane-rounds.)

Run: python tools/seg_groupkey_probe.py [block_kib] [nblocks]
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
    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_seg)

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    dev = jax.devices()[0]
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)
    print(f"[gk] {nb} x {bs} device {dev}", flush=True)

    # per-segment sequence counts (the live-round proxy; debug_rounds
    # returns GROUP lengths, not per-lane cost — measured useless as a
    # key)
    nsl, _, _ = compress_blocks_lockstep_seg(
        raw_d, rlen_d, bs, seg_nseq=True)
    nsl = np.asarray(nsl)
    print(f"[gk] seg nseq: mean {nsl.mean():.0f} max {nsl.max()} "
          f"p50 {np.percentile(nsl, 50):.0f} "
          f"p95 {np.percentile(nsl, 95):.0f}", flush=True)
    key = jnp.asarray(nsl.reshape(-1), jnp.int32)

    def timeit(label, **kw):
        def run(n=1):
            acc = None
            for _ in range(n):
                c, cl, e = compress_blocks_lockstep_seg(
                    raw_d, rlen_d, bs, **kw)
                s = jnp.sum(cl) + jnp.sum(e)
                acc = s if acc is None else acc + s
            return int(acc)

        t0 = time.perf_counter()
        run()
        print(f"[gk] {label}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(1)
            t1 = time.perf_counter()
            run(5)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 4)
        print(f"[gk] {label}: {best * 1e3:8.2f} ms "
              f"({nb * bs / best / 1e9:.3f} GB/s)", flush=True)

    timeit("dens-grouped (today)")
    timeit("nseq-grouped", group_key=key)
    timeit("ungrouped", group_sort=False)


if __name__ == "__main__":
    main()
