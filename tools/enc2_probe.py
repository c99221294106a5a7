"""On-TPU probe for the enc2 dense encoder.

Usage: python tools/enc2_probe.py [block_size_kib] [groups] [accel]
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
    dbg_rounds = bool(int(os.environ.get("E2_ROUNDS", "0")))
    dbg_pass1 = bool(int(os.environ.get("E2_PASS1", "0")))
    dbg_modes = bool(int(os.environ.get("E2_MODES", "0")))
    bs = bs_kib * 1024
    nb = groups * 128

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import golden, native
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.pallas.lockstep_enc2 import (
        compress_blocks_lockstep_enc2)

    data = _synth_corpus(nb * bs)
    raw_np, rlen_np = split_blocks(data, bs)
    print(f"[e2] {nb} x {bs} B blocks, accel={accel}", flush=True)

    dev = jax.devices()[0]
    print(f"[e2] device {dev}", flush=True)
    raw_d = jax.device_put(raw_np, dev)
    rlen_d = jax.device_put(rlen_np, dev)
    kw = dict(accel=accel, debug_rounds=dbg_rounds, debug_pass1=dbg_pass1,
              debug_modes=dbg_modes)

    t0 = time.perf_counter()
    comp, clen, err = compress_blocks_lockstep_enc2(
        raw_d, rlen_d, bs, **kw)
    s = int(jnp.sum(clen) + jnp.sum(err))
    print(f"[e2] compile+first run {time.perf_counter() - t0:.1f}s "
          f"(sum {s})", flush=True)

    if dbg_rounds:
        r = np.asarray(err)
        print(f"[e2] rounds: max={r.max()} mean={r.mean():.0f} "
              f"min={r.min()}", flush=True)
        return
    if dbg_modes:
        names = ["SRCH", "VFY", "PREP", "EXT", "EMIT", "HDR", "LIT",
                 "TAIL", "FHDR", "FLIT", "DONE", "w:refill", "w:wa",
                 "w:wb", "w:lit", "w:flush"]
        cnt = np.asarray(comp)[:, :64].copy().view(np.uint32)  # (nb, 16)
        tot_rounds = cnt[:, :11].sum(axis=1)
        print(f"[e2] rounds/lane: max={tot_rounds.max()} "
              f"mean={tot_rounds.mean():.0f}", flush=True)
        for m, nm in enumerate(names):
            c = cnt[:, m]
            print(f"[e2]   {nm:9s} mean={c.mean():8.0f} max={c.max():8d} "
                  f"({100 * c.mean() / max(tot_rounds.mean(), 1):.1f}%)",
                  flush=True)
        return
    if not dbg_pass1:
        nerr = int(jnp.sum(err))
        print(f"[e2] errors: {nerr}", flush=True)
        assert nerr == 0
    # parity + ratio vs the oracle and the reference encoder
    comp_np = np.asarray(comp) if not dbg_pass1 else None
    clen_np = np.asarray(clen)
    ref_total = 0
    mism = 0
    ncheck = min(nb, 128) if not dbg_pass1 else 0
    for j in range(ncheck):
        blk = raw_np[j, :rlen_np[j]].tobytes()
        want = golden.compress_dense(blk, acceleration=accel)
        ref_total += len(native.compress(blk))
        got = bytes(comp_np[j, :clen_np[j]])
        if got != want:
            if mism < 3:
                dd = next((i for i in range(min(len(got), len(want)))
                           if got[i] != want[i]),
                          min(len(got), len(want)))
                print(f"[e2] block {j}: got {len(got)}B want "
                      f"{len(want)}B first-diff {dd} "
                      f"got[{max(0, dd-4)}:{dd+8}]="
                      f"{got[max(0, dd-4):dd+8].hex()} "
                      f"want={want[max(0, dd-4):dd+8].hex()}", flush=True)
            mism += 1
    if ncheck:
        print(f"[e2] parity: {ncheck - mism}/{ncheck} exact vs "
              f"compress_dense; size {clen_np[:ncheck].sum()} vs "
              f"LZ4_compress_default {ref_total} "
              f"({clen_np[:ncheck].sum() / ref_total:.4f}x)", flush=True)
    assert mism == 0

    def run_n(k):
        acc = None
        for _ in range(k):
            comp, clen, err = compress_blocks_lockstep_enc2(
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
        run_n(K)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (K - 1))
    gbps = len(data) / best / 1e9
    print(f"[e2] RESULT block={bs} groups={groups} accel={accel} "
          f"best={best * 1e3:.2f} ms  {gbps:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
