"""Decompose the v4 decode dispatch cost: kernel vs pack/unpack/sort.

Usage: python tools/v4_overhead.py [block_size_kib] [groups] [slot_mode]

slot_mode: "tight" sizes the comp slot to the largest compressed block
(what tools/v4_probe.py measures); "bound" uses COMPRESSBOUND+8 padding
(what bench.py's encode output carries).

Times, on the same inputs:
  full      — decompress_blocks_device dispatch (bench's path)
  pack      — jit(vmap(pack_tapes)) alone
  unpack    — jit(vmap(unpack_tapes)) alone on the out-shaped tape
  sortg     — the two sort gathers (comp[order], data[inv]) alone
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _synth_corpus
from lz4_sgori_tpu import format as F, native
from lz4_sgori_tpu.blocks import split_blocks
from lz4_sgori_tpu.ops.decode import decompress_blocks_device
from lz4_sgori_tpu.ops.pallas import lockstep as LK


def timeit(label, fn, iters=5):
    fn()
    best = min(t for t in (time_one(fn) for _ in range(iters)))
    print(f"  {label:8s} {best * 1e3:8.2f} ms", flush=True)
    return best


def time_one(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    bs = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    slot_mode = sys.argv[3] if len(sys.argv) > 3 else "bound"
    nb = groups * 128
    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(nb)]
    if slot_mode == "tight":
        slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    else:
        slot = F.compress_bound(bs) + 8
    comp = np.zeros((nb, slot), np.uint8)
    clen = np.zeros(nb, np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    dev = jax.devices()[0]
    print(f"{nb} x {bs} blocks, slot {slot} ({slot_mode}), device {dev}",
          flush=True)
    comp_d = jax.device_put(comp, dev)
    clen_d = jax.device_put(clen, dev)

    def full():
        out, ln, e = decompress_blocks_device(comp_d, clen_d, bs)
        return int(jnp.sum(ln)) + int(jnp.sum(e))

    t_full = timeit("full", full)

    g8 = comp_d.reshape(groups, 128, slot)
    gl = clen_d.reshape(groups, 128)
    packf = jax.jit(jax.vmap(LK.pack_tapes))

    def pack():
        return int(jnp.sum(packf(g8, gl)[:, 0, :]))

    t_pack = timeit("pack", pack)

    orr = -(-bs // 4)
    words = jnp.zeros((groups, orr, 128), jnp.int32) + clen_d[0]
    unpackf = jax.jit(jax.vmap(LK.unpack_tapes))

    def unpack():
        return int(jnp.sum(unpackf(words)[:, 0, 0]))

    t_unpack = timeit("unpack", unpack)

    data_shaped = jnp.zeros((nb, bs), jnp.uint8) + jnp.uint8(1)

    @jax.jit
    def sortg_f(comp, clen, data):
        order = jnp.argsort(clen)
        inv = jnp.argsort(order)
        return comp[order][0, 0].astype(jnp.int32) + \
            data[inv][0, 0].astype(jnp.int32)

    def sortg():
        return int(sortg_f(comp_d, clen_d, data_shaped))

    t_sortg = timeit("sortg", sortg)
    resid = t_full - t_pack - t_unpack - t_sortg
    print(f"  residual (kernel + glue) {resid * 1e3:8.2f} ms "
          f"[{nb * bs / t_full / 1e9:.3f} GB/s full, "
          f"{nb * bs / max(resid, 1e-9) / 1e9:.3f} GB/s residual]",
          flush=True)


if __name__ == "__main__":
    main()
