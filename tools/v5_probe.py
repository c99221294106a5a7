"""On-TPU probe for the v5 group-interleaved lockstep decoder.

Usage: python tools/v5_probe.py [block_size_kib] [cells] [sr] [G] [unroll]
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
    cells = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    G = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    unroll = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    dbg_rounds = bool(int(os.environ.get("V5_ROUNDS", "0")))
    bs = bs_kib * 1024

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_v5 import (
        _pick_g, decompress_blocks_lockstep_v5)

    if G == 0:
        G = _pick_g(bs, -(-(bs + bs // 255 + 16) // 32) * 32)
    nb = cells * 128 * G
    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(nb)]
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp = np.zeros((nb, slot), np.uint8)
    clen = np.zeros(nb, np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    print(f"[v5] {nb} x {bs} B blocks ({cells} cells, G={G}), slot {slot}, "
          f"ratio {nb * bs / clen.sum():.3f}", flush=True)

    dev = jax.devices()[0]
    print(f"[v5] device {dev}", flush=True)
    comp_d = jax.device_put(comp, dev)
    clen_d = jax.device_put(clen, dev)
    kw = dict(sr=sr, G=G, unroll=unroll, debug_rounds=dbg_rounds)

    def run_n(n):
        acc = None
        for _ in range(n):
            out, out_len, err = decompress_blocks_lockstep_v5(
                comp_d, clen_d, bs, **kw)
            s = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(out_len)
                 + jnp.sum(err))
            acc = s if acc is None else acc + s
        return int(acc), out, out_len, err

    t0 = time.perf_counter()
    _, out, out_len, err = run_n(1)
    print(f"[v5] compile+first run {time.perf_counter() - t0:.1f}s",
          flush=True)

    if dbg_rounds:
        r = np.asarray(err)
        print(f"[v5] rounds: max={r.max()} mean={r.mean():.0f} "
              f"min={r.min()}", flush=True)
    else:
        nerr = int(jnp.sum(err))
        print(f"[v5] errors: {nerr}", flush=True)
        assert nerr == 0, "decode errors on corpus"
        lens_ok = int(np.sum(np.asarray(out_len, np.int64))) == len(data)
        raw_d = jax.device_put(raw_np, dev)
        valid = jnp.arange(bs)[None, :] < jax.device_put(rlen_np, dev)[:, None]
        mism = int(jnp.sum(jnp.where(valid, out != raw_d, False)))
        print(f"[v5] len_ok={lens_ok} mismatches={mism}", flush=True)
        assert lens_ok and mism == 0

    best = float("inf")
    K = 8
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(K)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (K - 1))
    gbps = len(data) / best / 1e9
    print(f"[v5] RESULT block={bs} cells={cells} G={G} sr={sr} "
          f"unroll={unroll} best={best * 1e3:.2f} ms  {gbps:.3f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
