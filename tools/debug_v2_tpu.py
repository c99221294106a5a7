"""Phase-by-phase TPU-vs-CPU divergence hunt for the v2 decoder.

Runs the batched phases on the TPU for sub-batch 0 of the bench corpus
(same shapes as tools/bench_v2.py, so compiles hit the persistent cache)
and compares the first NCMP blocks' outputs against the single-block CPU
pipeline (decode_v2's *_jit helpers, compiled for CPU). Prints the first
element-level divergence per phase.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/debug_v2_tpu.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4j_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lz4j_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _synth_corpus  # noqa: E402
from lz4_sgori_tpu import format as F  # noqa: E402
from lz4_sgori_tpu import native  # noqa: E402
from lz4_sgori_tpu.blocks import split_blocks  # noqa: E402
from lz4_sgori_tpu.ops.pallas import decode_v2 as V  # noqa: E402
from lz4_sgori_tpu.ops.pallas import decode_v2_tpu as T  # noqa: E402

BS = 65536
SUB = 32
NCMP = 4


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def fetch(x, n=NCMP):
    return np.asarray(x[:n])


def cmp(name, tpu_arr, cpu_arrs):
    """tpu_arr: (NCMP, ...); cpu_arrs: list of per-block arrays."""
    bad = 0
    for j, c in enumerate(cpu_arrs):
        t = tpu_arr[j]
        c = np.asarray(c)
        if t.shape != c.shape:
            log(f"  {name}[{j}]: SHAPE {t.shape} vs {c.shape}")
            bad += 1
            continue
        if not np.array_equal(t, c):
            d = np.nonzero(t != c)
            i0 = tuple(ax[0] for ax in d)
            log(f"  {name}[{j}]: {len(d[0])} diffs, first at {i0}: "
                f"tpu={t[i0]} cpu={c[i0]}")
            bad += 1
    if not bad:
        log(f"  {name}: OK ({len(cpu_arrs)} blocks)")
    return bad


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    log(f"tpu={tpu}")

    data = _synth_corpus(8 << 20)
    raw, rlen = split_blocks(data, BS)
    enc = native.compress
    assert native.available()
    slot = F.compress_bound(BS) + 8
    comp = np.zeros((SUB, slot), np.uint8)
    clen = np.zeros(SUB, np.int32)
    for j in range(SUB):
        c = enc(raw[j, :rlen[j]].tobytes())
        comp[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen[j] = len(c)

    nseg = T._nseg_bucket(slot)
    out_rows = BS // 128
    log(f"nseg={nseg} out_rows={out_rows}")

    # ---- CPU single-block references (cached CPU compiles) ----
    cpu_hops, cpu_ea, cpu_entries, cpu_ok = [], [], [], []
    with jax.default_device(cpu):
        for j in range(NCMP):
            b = np.zeros((nseg, 128), np.int32)
            b.reshape(-1)[:clen[j]] = comp[j, :clen[j]]
            bt_T = jnp.asarray(b.T.copy())
            cl = jnp.int32(int(clen[j]))
            h = V._hops_jit(bt_T, cl)
            ex = V._sweep_jit(h, cl)
            ent, ok = V.walk_chain_np(ex, int(clen[j]), nseg)
            cpu_hops.append({k: np.asarray(v) for k, v in h.items()})
            cpu_ea.append(np.asarray(ex["ea_tok"]))
            cpu_entries.append(ent.astype(np.int32))
            cpu_ok.append(ok)
            log(f"cpu ref block {j} done (ok={ok})")

    # ---- TPU batched phases ----
    c_t = jax.device_put(jnp.asarray(comp), tpu)
    cl_t = jax.device_put(jnp.asarray(clen), tpu)
    bt_T, comp_rows, words = T._prep(c_t, nseg)
    log("prep done")
    hops, ea = T._hops_sweep(bt_T, cl_t)
    hops_f = {k: fetch(v) for k, v in hops.items()}
    ea_f = fetch(ea)
    bad = 0
    for k in sorted(hops_f):
        bad += cmp(f"hops.{k}", hops_f[k], [h[k] for h in cpu_hops])
    bad += cmp("ea_tok", ea_f, cpu_ea)
    if bad:
        log("DIVERGENCE in hops/sweep — stopping here")
        return

    entries, walk_ok = T._walk_blocks(ea, words, cl_t, nseg)
    ent_f = fetch(entries)
    ok_f = fetch(walk_ok)
    log(f"walk_ok tpu={ok_f.tolist()} cpu={cpu_ok}")
    bad += cmp("entries", ent_f, cpu_entries)
    if bad:
        log("DIVERGENCE in walk kernel — stopping here")
        return

    # ---- later phases: CPU refs via the single-block jits ----
    cpu_recs, cpu_maps, cpu_lit, cpu_out = [], [], [], []
    with jax.default_device(cpu):
        for j in range(NCMP):
            h = {k: jnp.asarray(v) for k, v in cpu_hops[j].items()}
            cl = jnp.int32(int(clen[j]))
            entry = jnp.asarray(cpu_entries[j])[None, :]
            recs = V._rewalk_jit2(h, entry, cl)
            maps = V._classify_jit(recs, out_rows)
            b = np.zeros((nseg, 128), np.int32)
            b.reshape(-1)[:clen[j]] = comp[j, :clen[j]]
            lit = V._lit_jit(maps, jnp.asarray(b))
            out, rounds, conv = V._resolve_jit(maps, lit, out_rows)
            cpu_recs.append({k: np.asarray(v) for k, v in recs.items()})
            cpu_maps.append({k: np.asarray(v) for k, v in maps.items()})
            cpu_lit.append(np.asarray(lit))
            cpu_out.append(np.asarray(out))
            log(f"cpu ref block {j} phase2 done (rounds={int(rounds)}, "
                f"conv={int(conv)}, err={int(maps['err'])})")

    recs = T._rewalk_b(hops, entries, cl_t)
    recs_f = {k: fetch(v) for k, v in recs.items()}
    for k in sorted(recs_f):
        bad += cmp(f"recs.{k}", recs_f[k], [r[k] for r in cpu_recs])
    if bad:
        log("DIVERGENCE in rewalk — stopping here")
        return

    maps = T._classify_b(recs, out_rows)
    maps_f = {k: fetch(v) for k, v in maps.items()}
    for k in sorted(maps_f):
        bad += cmp(f"maps.{k}", maps_f[k], [m[k] for m in cpu_maps])
    if bad:
        log("DIVERGENCE in classify — stopping here")
        return

    lit = T._literals_b(maps, comp_rows)
    bad += cmp("lit", fetch(lit), cpu_lit)
    if bad:
        log("DIVERGENCE in gather_literals — stopping here")
        return

    out, rounds, conv = T._resolve_b(maps, lit, out_rows)
    log(f"tpu rounds={fetch(rounds).tolist()} conv={fetch(conv).tolist()}")
    bad += cmp("out", fetch(out), cpu_out)
    if bad:
        log("DIVERGENCE in resolve")
        return
    log("ALL PHASES MATCH for first %d blocks" % NCMP)


if __name__ == "__main__":
    main()
