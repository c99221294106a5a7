"""Measure the encoder-produced decode-cost hint end-to-end on TPU:
encode 4 groups of 64 KiB blocks (enc3 seg engine) with return_cost,
then time v7 decode with the nseq sort_key vs plain clen sorting."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/lz4j_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _synth_corpus
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.encode import compress_blocks_device
from lz4_sgori_tpu.ops.pallas.lockstep_v7 import decompress_blocks_lockstep_v7

bs = 65536
nb = 512
data = _synth_corpus(nb * bs)
raw_np, rlen_np = split_blocks(data, bs)
dev = jax.devices()[0]
raw = jax.device_put(raw_np, dev)
rlen = jax.device_put(rlen_np, dev)
comp, clen, cost = compress_blocks_device(raw, rlen, bs, return_cost=True)
comp = jnp.pad(comp, ((0, 0), (0, 8)))
print("cost stats:", int(jnp.min(cost)), int(jnp.max(cost)), flush=True)

def timeit(key, tag):
    def run_n(n):
        acc = None
        for _ in range(n):
            out, ln, e = decompress_blocks_lockstep_v7(
                comp, clen, bs, sort_key=key)
            s = jnp.sum(out.astype(jnp.int32)) + jnp.sum(ln) + jnp.sum(e)
            acc = s if acc is None else acc + s
        return int(acc)
    out, ln, e = decompress_blocks_lockstep_v7(comp, clen, bs, sort_key=key)
    ne = int(jnp.sum(e))
    valid = jnp.arange(bs)[None, :] < rlen[:, None]
    mism = int(jnp.sum(jnp.where(valid, out != raw, False)))
    print(f"[{tag}] errors={ne} mismatches={mism}", flush=True)
    assert ne == 0 and mism == 0
    run_n(1)
    best = float("inf")
    K = 8
    for _ in range(3):
        t0 = time.perf_counter(); run_n(1)
        t1 = time.perf_counter(); run_n(K)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (K - 1))
    print(f"[{tag}] {best*1e3:.2f} ms  {len(data)/best/1e9:.3f} GB/s",
          flush=True)

timeit(None, "clen-sort")
timeit(cost, "nseq-hint")
