"""On-TPU probe for the enc3 sort-based encoder.

Usage: python tools/enc3_probe.py [block_size_kib] [groups] [accel]
Env:   E3_ROUNDS=1 round counts; E3_MODES=1 mode histogram;
       E3_CAND=1 pass-1 only (timing + parity); E3_NOSORT=1 disable
       density grouping.
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
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    accel = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    dbg_rounds = bool(int(os.environ.get("E3_ROUNDS", "0")))
    dbg_modes = bool(int(os.environ.get("E3_MODES", "0")))
    cand_only = bool(int(os.environ.get("E3_CAND", "0")))
    mlen_cand = bool(int(os.environ.get("E3_MLEN", "0")))
    if mlen_cand:
        cand_only = True
    group_sort = not bool(int(os.environ.get("E3_NOSORT", "0")))
    bs = bs_kib * 1024
    nb = groups * 128

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import golden, native
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    print(f"[e3] {nb} x {bs} B blocks, accel={accel}", flush=True)

    dev = jax.devices()[0]
    print(f"[e3] device {dev}", flush=True)
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)
    kw = dict(accel=accel, debug_rounds=dbg_rounds, debug_modes=dbg_modes,
              group_sort=group_sort, cand_only=cand_only)
    if mlen_cand:
        kw["mlen_cand"] = True

    t0 = time.perf_counter()
    out = compress_blocks_lockstep_enc3(raw_d, rlen_d, bs, **kw)
    if cand_only:
        if mlen_cand:
            cand, _mcode, dens = out
        else:
            cand, dens = out
        s = int(jnp.sum(dens))
        print(f"[e3] cand compile+first {time.perf_counter() - t0:.1f}s "
              f"(dens sum {s})", flush=True)
        cand_np = np.asarray(cand)
        mism = 0
        for j in range(min(8, 128)):
            want = golden.dense_candidates(
                raw_np[j, :rlen_np[j]].tobytes(), hashlog=16,
                val16_filter=False)
            got = cand_np[0, :, j] & 0xFFFF
            wantp = np.zeros(cand_np.shape[1], np.int64)
            wantp[:len(want)] = want
            if not np.array_equal(got, wantp):
                bad = np.nonzero(got != wantp)[0]
                print(f"[e3] block {j}: d16 mismatch at {bad[:8]}",
                      flush=True)
                mism += 1
        print(f"[e3] pass-1 parity: {8 - mism}/8", flush=True)

        def run_n(k):
            acc = None
            for _ in range(k):
                c, d = compress_blocks_lockstep_enc3(raw_d, rlen_d, bs, **kw)
                s = jnp.sum(d) + jnp.sum(c[0, :2])
                acc = s if acc is None else acc + s
            return int(acc)

        run_n(1)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_n(1)
            t1 = time.perf_counter()
            run_n(9)
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
        print(f"[e3] CAND RESULT {best * 1e3:.2f} ms "
              f"{len(data) / best / 1e9:.3f} GB/s", flush=True)
        return

    comp, clen, err = out
    s = int(jnp.sum(clen) + jnp.sum(err))
    print(f"[e3] compile+first run {time.perf_counter() - t0:.1f}s "
          f"(sum {s})", flush=True)

    if dbg_rounds:
        r = np.asarray(err)
        print(f"[e3] rounds: max={r.max()} mean={r.mean():.0f} "
              f"min={r.min()}", flush=True)
        return
    if dbg_modes:
        names = ["SRCH", "VFY", "PREP", "EXT", "EMIT", "HDR", "LIT",
                 "TAIL", "FHDR", "FLIT", "DONE", "v:refill", "v:wa",
                 "v:wb", "w:unused", "w:flush"]
        cnt = np.asarray(comp)[:, :64].copy().view(np.uint32)  # (nb, 16)
        tot_rounds = cnt[:, :11].sum(axis=1)
        print(f"[e3] rounds/lane: max={tot_rounds.max()} "
              f"mean={tot_rounds.mean():.0f}", flush=True)
        for m, nm in enumerate(names):
            c = cnt[:, m]
            print(f"[e3]   {nm:9s} mean={c.mean():8.0f} max={c.max():8d} "
                  f"({100 * c.mean() / max(tot_rounds.mean(), 1):.1f}%)",
                  flush=True)
        return

    nerr = int(jnp.sum(err))
    print(f"[e3] errors: {nerr}", flush=True)
    assert nerr == 0
    comp_np = np.asarray(comp)
    clen_np = np.asarray(clen)
    ref_total = 0
    mism = 0
    ncheck = min(nb, 128)
    for j in range(ncheck):
        blk = raw_np[j, :rlen_np[j]].tobytes()
        want = golden.compress_dense(blk, acceleration=accel, hashlog=16)
        ref_total += len(native.compress(blk))
        got = bytes(comp_np[j, :clen_np[j]])
        if got != want:
            if mism < 3:
                dd = next((i for i in range(min(len(got), len(want)))
                           if got[i] != want[i]),
                          min(len(got), len(want)))
                print(f"[e3] block {j}: got {len(got)}B want "
                      f"{len(want)}B first-diff {dd} "
                      f"got[{max(0, dd-4)}:{dd+8}]="
                      f"{got[max(0, dd-4):dd+8].hex()} "
                      f"want={want[max(0, dd-4):dd+8].hex()}", flush=True)
            mism += 1
    print(f"[e3] parity: {ncheck - mism}/{ncheck} exact vs "
          f"compress_dense/16; size {clen_np[:ncheck].sum()} vs "
          f"LZ4_compress_default {ref_total} "
          f"({clen_np[:ncheck].sum() / ref_total:.4f}x)", flush=True)
    assert mism == 0

    def run_n(k):
        acc = None
        for _ in range(k):
            comp, clen, err = compress_blocks_lockstep_enc3(
                raw_d, rlen_d, bs, **kw)
            s = jnp.sum(clen) + jnp.sum(err) + jnp.sum(comp[0, :8]
                                                       .astype(jnp.int32))
            acc = s if acc is None else acc + s
        return int(acc)

    run_n(1)
    best = float("inf")
    K = 64 if bs <= 16 * 1024 and groups <= 8 else 8
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(K + 1)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K)
    gbps = len(data) / best / 1e9
    print(f"[e3] RESULT block={bs} groups={groups} accel={accel} "
          f"best={best * 1e3:.2f} ms  {gbps:.3f} GB/s", flush=True)


def main_samereplica():
    """All 128 lanes get the SAME block: cross-lane spans collapse, so
    this measures the zero-divergence round cost (the walk-span share)."""
    bs = 65536
    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu.ops.pallas.lockstep_enc3 import (
        compress_blocks_lockstep_enc3)
    data = _synth_corpus(bs)
    raw_np = np.tile(np.frombuffer(data, np.uint8)[None, :], (128, 1))
    rlen_np = np.full(128, bs, np.int32)
    dev = jax.devices()[0]
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)
    unroll = int(os.environ.get("E3_UNROLL", "2"))

    def run_n(k):
        acc = None
        for _ in range(k):
            comp, clen, err = compress_blocks_lockstep_enc3(
                raw_d, rlen_d, bs, unroll=unroll)
            s = jnp.sum(clen) + jnp.sum(err)
            acc = s if acc is None else acc + s
        return int(acc)

    run_n(1)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_n(1)
        t1 = time.perf_counter()
        run_n(9)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 8)
    print(f"[e3] SAME-BLOCK RESULT unroll={unroll} best={best * 1e3:.2f} ms "
          f"{128 * bs / best / 1e9:.3f} GB/s", flush=True)


if os.environ.get("E3_SAME") == "1":
    main = main_samereplica

if __name__ == "__main__":
    main()
