"""On-TPU probe for the v4 lockstep decoder.

Usage: python tools/v4_probe.py [block_size_kib] [groups] [sr] [sort]
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
    bs_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sr = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    sort = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    unroll = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    nofar = bool(int(os.environ.get("V4_NOFAR", "0")))
    noplace = bool(int(os.environ.get("V4_NOPLACE", "0")))
    nostag = bool(int(os.environ.get("V4_NOSTAG", "0")))
    dbg_rounds = bool(int(os.environ.get("V4_ROUNDS", "0")))
    timing_only = nofar or noplace or nostag
    kw = dict(unroll=unroll, nofar=nofar, noplace=noplace,
              nostag=nostag, debug_rounds=dbg_rounds)
    bs = bs_kib * 1024
    nb = groups * 128

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_v4 import (
        decompress_blocks_lockstep_v4)

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
    ratio = nb * bs / clen.sum()
    print(f"[v4] {nb} x {bs} B blocks, slot {slot}, ratio {ratio:.3f}, "
          f"sort={sort}", flush=True)

    dev = jax.devices()[0]
    print(f"[v4] device {dev}", flush=True)
    comp_d = jax.device_put(comp, dev)
    clen_d = jax.device_put(clen, dev)

    def run():
        out, out_len, err = decompress_blocks_lockstep_v4(
            comp_d, clen_d, bs, sr=sr, sort=sort, **kw)
        s = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(out_len)
             + jnp.sum(err))
        return out, out_len, err, int(s)

    t0 = time.perf_counter()
    out, out_len, err, _ = run()
    print(f"[v4] compile+first run {time.perf_counter() - t0:.1f}s",
          flush=True)

    if dbg_rounds:
        r = np.asarray(err)
        print(f"[v4] rounds: max={r.max()} mean={r.mean():.0f} "
              f"min={r.min()}", flush=True)
    else:
        nerr = int(jnp.sum(err))
        print(f"[v4] errors: {nerr}", flush=True)
        assert timing_only or nerr == 0, "decode errors on corpus"
    lens_ok = int(np.sum(np.asarray(out_len, np.int64))) == len(data)
    raw_d = jax.device_put(raw_np, dev)
    valid = jnp.arange(bs)[None, :] < jax.device_put(rlen_np, dev)[:, None]
    mism = int(jnp.sum(jnp.where(valid, out != raw_d, False)))
    print(f"[v4] len_ok={lens_ok} mismatches={mism}", flush=True)
    assert timing_only or (lens_ok and mism == 0)

    # Repeat-count differencing: the axon proxy adds ~30 ms per fetch, so
    # time k dispatches against 1 dispatch with a single trailing fetch.
    def run_n(n):
        acc = None
        for _ in range(n):
            out, out_len, err = decompress_blocks_lockstep_v4(
                comp_d, clen_d, bs, sr=sr, sort=sort, **kw)
            s = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(out_len)
                 + jnp.sum(err))
            acc = s if acc is None else acc + s
        return int(acc)

    run_n(1)
    best = float("inf")
    # small workloads need more repeats: the axon proxy adds +-15 ms of
    # fetch jitter and min-of-differences biases low when K*T ~ jitter
    K = 64 if bs <= 16 * 1024 and groups <= 8 else 8
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(K)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (K - 1))
    gbps = len(data) / best / 1e9
    print(f"[v4] RESULT block={bs} sr={sr} groups={groups} sort={sort} "
          f"kw={kw} "
          f"best={best * 1e3:.2f} ms  {gbps:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
