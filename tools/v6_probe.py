"""On-TPU probe for the v6 ring lockstep decoder.

Usage: python tools/v6_probe.py [block_size_kib] [groups] [sr] [sort]
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
    unroll = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    streams = int(os.environ.get("V6_STREAMS", "1"))
    dbg_rounds = bool(int(os.environ.get("V6_ROUNDS", "0")))
    nofar = bool(int(os.environ.get("V6_NOFAR", "0")))
    noflush = bool(int(os.environ.get("V6_NOFLUSH", "0")))
    timing_only = nofar or noflush
    kw = dict(unroll=unroll, streams=streams, debug_rounds=dbg_rounds,
              nofar=nofar, noflush=noflush)
    bs = bs_kib * 1024
    nb = groups * 128

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import native
    from lz4_sgori_tpu.blocks import split_blocks
    if os.environ.get("V6_ENGINE") == "v8":
        from lz4_sgori_tpu.ops.pallas.lockstep_v8 import (
            decompress_blocks_lockstep_v8 as decompress_blocks_lockstep_v6)
        kw.pop("streams", None)
        kw.pop("nofar", None)
        kw.pop("noflush", None)
    elif os.environ.get("V6_ENGINE") == "v9":
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.path.join(_os.path.dirname(
            _os.path.dirname(_os.path.abspath(__file__))),
            "tools", "retired"))
        from lockstep_v9 import (
            decompress_blocks_lockstep_v9 as decompress_blocks_lockstep_v6)
        kw.pop("streams", None)
        kw.pop("nofar", None)
        kw.pop("noflush", None)
        kw["transfers"] = int(os.environ.get("V7_TRANSFERS", "2"))
        kw["chain"] = int(os.environ.get("V9_CHAIN", "4"))
    elif os.environ.get("V6_ENGINE") == "v7":
        import lz4_sgori_tpu.ops.pallas.lockstep_v7 as v7mod
        if os.environ.get("V7_HOT"):
            # hot-ring size sweep: patch the module constants before
            # any trace (HSPAN/HOT_D derive from HOT)
            v7mod.HOT = int(os.environ["V7_HOT"])
            v7mod.HSPAN = v7mod.HOT * 4
            v7mod.HOT_D = v7mod.HSPAN - 4
            print(f"[v6] HOT={v7mod.HOT}", flush=True)
        decompress_blocks_lockstep_v6 = v7mod.decompress_blocks_lockstep_v7
        kw.pop("streams", None)
        kw["transfers"] = int(os.environ.get("V7_TRANSFERS", "2"))
    else:
        from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (
            decompress_blocks_lockstep_v6)

    if os.environ.get("V6_SAME") == "1":
        # all lanes decode the SAME block: cross-lane walk spans collapse,
        # isolating the zero-divergence round cost
        data = _synth_corpus(bs) * nb
    else:
        data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    comps = [native.compress(raw_np[j, :rlen_np[j]].tobytes())
             for j in range(nb)]
    # V6_KEY=rounds: pre-order blocks by simulated solo decode rounds
    # (the oracle grouping key) and disable the kernel's clen sort —
    # quantifies what a perfect scheduling hint would buy.
    if os.environ.get("V6_KEY") == "rounds":
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__))))
        from round_sim import parse_sequences
        from round_sim4 import RingLane

        def solo_rounds(c):
            ln = RingLane(parse_sequences(c), bs)
            r = 0
            while ln.mode != 6:
                ln.step(sr * 4)
                ln.fl = max(ln.fl, ln.op - sr * 4 // 2)
                r += 1
            return r

        keys = [solo_rounds(c) for c in comps]
        order = np.argsort(np.asarray(keys), kind="stable")
        perm = list(order)
        comps = [comps[i] for i in perm]
        raw_np = raw_np[perm]
        rlen_np = rlen_np[perm]
        sort = False
        print(f"[v6] oracle key: solo rounds min={min(keys)} "
              f"max={max(keys)}", flush=True)
    if os.environ.get("V6_ENGINE") == "v9" and sort:
        # production chaining key: per-block sequence count (what the
        # encoder returns for free via return_cost)
        from chain_sim import count_sequences
        kw["sort_key"] = np.asarray(
            [count_sequences(c) for c in comps], np.int32)
    slot = -(-(max(len(c) for c in comps) + 8) // 32) * 32
    comp = np.zeros((nb, slot), np.uint8)
    clen = np.zeros(nb, np.int32)
    for j, c in enumerate(comps):
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)
    ratio = nb * bs / clen.sum()
    print(f"[v6] {nb} x {bs} B blocks, slot {slot}, ratio {ratio:.3f}, "
          f"sort={sort}", flush=True)

    dev = jax.devices()[0]
    print(f"[v6] device {dev}", flush=True)
    comp_d = jax.device_put(comp, dev)
    clen_d = jax.device_put(clen, dev)

    def run():
        out, out_len, err = decompress_blocks_lockstep_v6(
            comp_d, clen_d, bs, sr=sr, sort=sort, **kw)
        s = (jnp.sum(out.astype(jnp.int32)) + jnp.sum(out_len)
             + jnp.sum(err))
        return out, out_len, err, int(s)

    t0 = time.perf_counter()
    out, out_len, err, _ = run()
    print(f"[v6] compile+first run {time.perf_counter() - t0:.1f}s",
          flush=True)

    if dbg_rounds:
        r = np.asarray(err)
        print(f"[v6] rounds: max={r.max()} mean={r.mean():.0f} "
              f"min={r.min()}", flush=True)
    else:
        nerr = int(jnp.sum(err))
        print(f"[v6] errors: {nerr}", flush=True)
        assert timing_only or nerr == 0, "decode errors on corpus"
    lens_ok = int(np.sum(np.asarray(out_len, np.int64))) == len(data)
    raw_d = jax.device_put(raw_np, dev)
    valid = jnp.arange(bs)[None, :] < jax.device_put(rlen_np, dev)[:, None]
    mism = int(jnp.sum(jnp.where(valid, out != raw_d, False)))
    print(f"[v6] len_ok={lens_ok} mismatches={mism}", flush=True)
    assert timing_only or (lens_ok and mism == 0)

    # Repeat-count differencing: the axon proxy adds ~30 ms per fetch, so
    # time k dispatches against 1 dispatch with a single trailing fetch.
    def run_n(n):
        acc = None
        for _ in range(n):
            out, out_len, err = decompress_blocks_lockstep_v6(
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
    print(f"[v6] RESULT block={bs} sr={sr} groups={groups} sort={sort} "
          f"kw={kw} "
          f"best={best * 1e3:.2f} ms  {gbps:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
