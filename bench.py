"""Benchmark harness: device codec GB/s vs the reference-equivalent baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (BASELINE.json config 1): decompress GB/s/chip on a
Silesia-like mixed corpus at 64 KB blocks (Silesia itself is unreachable in
this zero-egress environment, so a deterministic corpus spanning the same
compressibility regimes stands in). ``vs_baseline`` compares against
single-core liblz4 decode throughput measured on the same corpus on this
host — the reference's own speed class, since its codec is stock
single-threaded LZ4 semantics in kernel C (SURVEY.md §6: the reference
publishes no numbers).

Also measured, per BASELINE.json:
  config 2 — enwik8-like text at 256 KiB blocks (long literal runs,
             multi-byte LSIC lengths); v6 ring decode (the envelope-edge
             engine).
  config 3 — bdev-style 4 KiB chunks, zero/random mix.
  config 5 — deep-match mode (seg engine, depth 3 + one-step lazy) on a
             distinct 128 MiB corpus; the exhaustive XLA engine's size
             envelope is sampled alongside.
  config 6 — 1 MiB blocks: seg encode with piecewise candidates (ratio
             contract at the fio envelope top) + v8 HBM-tape decode.

Timing methodology: on proxied TPU attachments (axon) ``block_until_ready``
can acknowledge dispatch before execution completes, and bulk device->host
transfers ride a slow tunnel. Every timed run therefore forces completion
by fetching a scalar reduction that data-depends on every output, and
correctness is checked with on-device comparisons plus a host spot-check of
one sub-batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BLOCK_SIZE = 65536
CORPUS_MB = 32
# the lockstep decode engine runs 128 blocks per grid cell; decode launches
# therefore carry the whole corpus (block counts here are 128-multiples)


def _retry(fn, tries: int = 3, delay: float = 15.0):
    """Retry a device call across transient axon-proxy failures (the
    remote compile channel occasionally drops mid-body: 'response body
    closed before all bytes were read'). Compiles are cached, so a
    retry after a dropped compile usually lands instantly."""
    for t in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - proxy errors vary
            if t == tries - 1:
                raise
            _log(f"# transient device failure ({e.__class__.__name__}); "
                 f"retry {t + 1}/{tries - 1} in {delay:.0f}s")
            time.sleep(delay)


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _time_best(fn, iters=5, warmup=1):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_diff(launch, K=4, reps=3, min_signal=0.1):
    """Per-run seconds by repeat-count differencing.

    ``launch(n)`` must dispatch n back-to-back device runs and force them
    with ONE trailing scalar fetch. On proxied TPU attachments (axon) every
    device->host scalar fetch costs a ~30 ms tunnel round trip, so timing
    single runs would be dominated by the fetch; differencing n=1 against
    n=K+1 cancels it.

    Round-2 postmortem (BENCH_r02 published -3.58 GB/s): taking the MIN
    of noisy differences selects the most-negative noise excursion, and
    a fixed K leaves sub-ms runs far below the fetch-noise floor. Now
    the estimate is the MEDIAN of reps, K escalates until the differenced
    signal K*t is at least `min_signal` seconds, and the result is
    asserted positive.
    """
    launch(1)
    while True:
        diffs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            launch(1)
            t1 = time.perf_counter()
            launch(K + 1)
            t2 = time.perf_counter()
            diffs.append(((t2 - t1) - (t1 - t0)) / K)
        diffs.sort()
        med = diffs[len(diffs) // 2]
        if med > 0 and med * K >= min_signal:
            return med
        if K >= 1024:
            assert med > 0, f"unstable timing: diffs={diffs} at K={K}"
            return med
        K *= 4


def _synth_text(nbytes: int, seed: int = 7) -> bytes:
    """enwik8-like corpus: wiki-markup text — long natural-language literal
    runs, repeated tag/template structure, LSIC-exercising run lengths."""
    rng = np.random.default_rng(seed)
    vocab = (
        "the of and in to a is was for on as by with from at it that this "
        "article page history category external links references see also "
        "redirect template infobox population area country state city "
        "which were has had its an be are or not but his her their one "
        "two first second new old large small national international "
        "system theory science language world war year century government"
    ).split()
    parts = []
    while sum(map(len, parts)) < nbytes:
        title = " ".join(rng.choice(vocab, rng.integers(1, 4)))
        parts.append(f"<page>\n  <title>{title}</title>\n  <text>".encode())
        for _ in range(int(rng.integers(2, 8))):
            n = int(rng.integers(40, 400))
            words = rng.choice(vocab, n)
            sent = " ".join(words)
            if rng.random() < 0.3:
                sent = "[[" + sent[:20] + "]]" + sent[20:]
            parts.append(sent.encode() + b". ")
        parts.append(b"\n  </text>\n</page>\n")
    return b"".join(parts)[:nbytes]


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the (multi-minute,
    # remote on axon) XLA compiles
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/lz4j_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _synth_corpus
    from lz4_sgori_tpu import format as F
    from lz4_sgori_tpu.blocks import split_blocks
    from lz4_sgori_tpu.ops.decode import decompress_blocks_device
    from lz4_sgori_tpu.ops.encode import compress_blocks_device
    from lz4_sgori_tpu.utils import oracle

    data = _synth_corpus(CORPUS_MB << 20)
    raw_np, rlen_np = split_blocks(data, BLOCK_SIZE)
    nblocks = raw_np.shape[0]
    assert nblocks % 128 == 0, nblocks  # full 128-lane lockstep groups

    dev = jax.devices()[0]
    raw_all = jax.device_put(raw_np, dev)
    rlen_all = jax.device_put(rlen_np, dev)
    _log(f"corpus {CORPUS_MB} MiB, {nblocks} blocks of {BLOCK_SIZE}, "
         f"device {dev}")

    # --- device encode: ONE launch over the whole corpus (the enc3
    # lockstep engine grids over 128-block groups internally and its
    # density regrouping needs the full batch) ---
    def run_encode():
        # return_cost: per-block sequence counts, threaded to decode as
        # its lane-grouping hint (corr 0.9999 with decode rounds)
        comp, clen, cost = compress_blocks_device(raw_all, rlen_all,
                                                  BLOCK_SIZE,
                                                  return_cost=True)
        return comp, clen, cost, int(jnp.sum(clen))

    def launch_encode(n):
        acc = None
        for _ in range(n):
            comp, clen = compress_blocks_device(raw_all, rlen_all,
                                                BLOCK_SIZE)
            s = jnp.sum(clen) + jnp.sum(comp[0, :8].astype(jnp.int32))
            acc = s if acc is None else acc + s
        return int(acc)

    _log("compiling + warming encode...")
    comp_dev, clen_dev, cost_dev, comp_total = _retry(run_encode)
    _log("timing encode...")
    t_enc = _time_diff(launch_encode, K=2)
    enc_gbps = len(data) / t_enc / 1e9
    _log(f"encode {enc_gbps:.3f} GB/s, compressed {comp_total}")

    # keep compressed data on device; spot-check one block on host
    comp0 = np.asarray(comp_dev[:1])
    clen0 = np.asarray(clen_dev[:1])
    from lz4_sgori_tpu import golden
    got = golden.decompress(comp0[0, :clen0[0]].tobytes(), BLOCK_SIZE)
    assert got == data[:BLOCK_SIZE], "encode spot-check failed"
    _log("encode spot-check ok (golden decode of block 0)")

    # --- device decode (headline): one launch over the whole corpus so the
    # lockstep engine fills its 128-block grid cells and its cost-sorting
    # sees the full batch ---
    slot = comp_dev.shape[1] + 8
    comp_all = jnp.pad(comp_dev, ((0, 0), (0, slot - comp_dev.shape[1])))
    clen_all = clen_dev

    def run_decode():
        # decompress_blocks_device auto-selects the lockstep engine on TPU
        out, ln, e = decompress_blocks_device(comp_all, clen_all, BLOCK_SIZE,
                                              cost_key=cost_dev)
        return out, int(jnp.sum(e)), int(jnp.sum(ln))

    def launch_decode(n):
        acc = None
        for _ in range(n):
            out, ln, e = decompress_blocks_device(comp_all, clen_all,
                                                  BLOCK_SIZE,
                                                  cost_key=cost_dev)
            s = jnp.sum(ln) + jnp.sum(e) + jnp.sum(out[0, :8].astype(
                jnp.int32))
            acc = s if acc is None else acc + s
        return int(acc)

    _log("compiling + warming decode...")
    dec_out, errs, lens = _retry(run_decode)
    assert errs == 0, "bench corpus failed to decode"
    assert lens == len(data), (lens, len(data))
    # on-device bit-exactness check against the original raw blocks
    valid = jnp.arange(BLOCK_SIZE)[None, :] < rlen_all[:, None]
    mismatch = int(jnp.sum(jnp.where(valid, dec_out != raw_all, False)))
    assert mismatch == 0, f"{mismatch} mismatching bytes"
    _log("decode verified bit-exact on device")
    # host spot-check of one block
    assert np.asarray(dec_out[1]).tobytes() == \
        data[BLOCK_SIZE:2 * BLOCK_SIZE]

    _log("timing decode...")
    t_dec = _time_diff(launch_decode)
    dec_gbps = len(data) / t_dec / 1e9
    _log(f"decode {dec_gbps:.3f} GB/s")

    # --- baseline: single-core liblz4 on the same blocks (the reference's
    # speed class: stock LZ4 in kernel C, single-threaded). Pinned
    # protocol: fixed deterministic corpus (same seed every round),
    # MEDIAN of 7 repeats with recorded spread, recorded lz4 version —
    # round-over-round vs_baseline stays apples-to-apples. ---
    base_dec_gbps = base_enc_gbps = None
    ratio_vs_lz4 = None
    baseline_protocol = None
    if oracle.available():
        blocks_raw = [data[i:i + BLOCK_SIZE]
                      for i in range(0, len(data), BLOCK_SIZE)]
        REPS = 7
        te, td = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            lz4_comps = [oracle.compress(b) for b in blocks_raw]
            te.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for c, b in zip(lz4_comps, blocks_raw):
                oracle.decompress(c, len(b))
            td.append(time.perf_counter() - t0)
        te.sort()
        td.sort()
        t_be, t_bd = te[REPS // 2], td[REPS // 2]
        base_enc_gbps = len(data) / t_be / 1e9
        base_dec_gbps = len(data) / t_bd / 1e9
        lz4_total = sum(len(c) for c in lz4_comps)
        ratio_vs_lz4 = comp_total / lz4_total  # <= 1.0 is the contract
        baseline_protocol = {
            "stat": f"median of {REPS}",
            "corpus": f"fixed-seed synth {CORPUS_MB} MiB @ {BLOCK_SIZE}",
            "decode_spread_gbps": [round(len(data) / td[-1] / 1e9, 3),
                                   round(len(data) / td[0] / 1e9, 3)],
            "lz4_version": oracle.version(),
        }
        _log(f"liblz4 baseline: encode {base_enc_gbps:.3f} GB/s, "
             f"decode {base_dec_gbps:.3f} GB/s "
             f"(spread {baseline_protocol['decode_spread_gbps']}, "
             f"lz4 {baseline_protocol['lz4_version']}), "
             f"size ratio {ratio_vs_lz4:.4f}")

    # --- roofline: decode as a fraction of chip HBM bandwidth (the
    # north-star metric class, BASELINE.json). Decode moves >= 2 bytes
    # per output byte (comp read + out write + match re-reads), so the
    # reported fraction uses output bytes / time vs peak GB/s. ---
    HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0,
                "TPU v5p": 2765.0, "TPU v4": 1228.0}
    hbm_peak = next((v for k, v in HBM_GBPS.items()
                     if str(dev).startswith(k)), None)

    # --- single-chip block-parallel scaling: groups x 128 blocks ---
    # (the honest stand-in for the unavailable multi-chip run: shows the
    # block axis is linear on real hardware; MULTICHIP_r04 covers the
    # sharded pipeline's correctness on a virtual mesh)
    scaling = {}
    for gcount in (1, 2, 4):
        nb_g = 128 * gcount
        comp_g = comp_all[:nb_g]
        clen_g = clen_all[:nb_g]

        cost_g = cost_dev[:nb_g]

        def launch_g(n, comp_g=comp_g, clen_g=clen_g, cost_g=cost_g):
            acc = None
            for _ in range(n):
                out, ln, e = decompress_blocks_device(comp_g, clen_g,
                                                      BLOCK_SIZE,
                                                      cost_key=cost_g)
                s = jnp.sum(ln) + jnp.sum(e)
                acc = s if acc is None else acc + s
            return int(acc)

        t_g = _time_diff(launch_g)
        scaling[f"{gcount}x128"] = round(
            float(jnp.sum(rlen_all[:nb_g])) / t_g / 1e9, 3)
    _log(f"decode scaling (groups x 128 blocks): {scaling}")

    # --- config 2: enwik8-like text, 256 KiB blocks ---
    # Encoded host-side at exact LZ4_compress_default parity. A device
    # encode was MEASURED and rejected (round 5): this text's matches
    # sit at 32-64 KiB distances, and ANY 64 KiB-piecewise candidate
    # scheme — including stock lz4 split at 64 KiB — pays 1.137x
    # against full-window 256 KiB lz4 (the seg_big engine measured
    # 1.1389x, i.e. exactly lz4-at-64K parity class). size_vs_lz4
    # therefore sits at 1.0 by construction here; the nseq decode-cost
    # hints are token-walked from the streams host-side (one-time,
    # outside the timed path).
    from lz4_sgori_tpu import native
    bs2 = 256 * 1024
    text = _synth_text(CORPUS_MB << 20)
    raw2_np, rlen2_np = split_blocks(text, bs2)
    comp2s = [native.compress(text[i:i + bs2])
              for i in range(0, len(text), bs2)]
    slot2 = -(-(max(len(c) for c in comp2s) + 8) // 128) * 128
    comp2_np = np.zeros((len(comp2s), slot2), np.uint8)
    clen2_np = np.zeros(len(comp2s), np.int32)
    for j, c in enumerate(comp2s):
        comp2_np[j, :len(c)] = np.frombuffer(c, np.uint8)
        clen2_np[j] = len(c)

    def _count_sequences(comp: bytes) -> int:
        i, n, nseq = 0, len(comp), 0
        while i < n:
            tok = comp[i]
            i += 1
            nseq += 1
            lit = tok >> 4
            if lit == 15:
                while True:
                    b = comp[i]
                    i += 1
                    lit += b
                    if b != 255:
                        break
            i += lit
            if i >= n:
                break
            i += 2
            if (tok & 15) == 15:
                while True:
                    b = comp[i]
                    i += 1
                    if b != 255:
                        break
        return nseq

    cost2 = jax.device_put(
        np.asarray([_count_sequences(c) for c in comp2s], np.int32), dev)
    comp2 = jax.device_put(comp2_np, dev)
    clen2 = jax.device_put(clen2_np, dev)
    raw2 = jax.device_put(raw2_np, dev)
    rlen2 = jax.device_put(rlen2_np, dev)
    lz4_total2 = 0
    if oracle.available():
        lz4_total2 = sum(len(oracle.compress(text[i:i + bs2]))
                         for i in range(0, len(text), bs2))
    total2 = sum(len(c) for c in comp2s)
    enc2_gbps = None

    def run_dec2():
        out, ln, e = decompress_blocks_device(comp2, clen2, bs2,
                                              cost_key=cost2)
        return out, int(jnp.sum(e)), int(jnp.sum(ln))

    def launch_dec2(n):
        acc = None
        for _ in range(n):
            out, ln, e = decompress_blocks_device(comp2, clen2, bs2,
                                                  cost_key=cost2)
            s = jnp.sum(ln) + jnp.sum(e)
            acc = s if acc is None else acc + s
        return int(acc)

    _log("config 2: compiling decode...")
    out2, errs2, lens2 = _retry(run_dec2)
    assert errs2 == 0 and lens2 == len(text), (errs2, lens2)
    valid2 = jnp.arange(bs2)[None, :] < rlen2[:, None]
    assert int(jnp.sum(jnp.where(valid2, out2 != raw2, False))) == 0
    t_dec2 = _time_diff(launch_dec2, K=3)
    dec2_gbps = len(text) / t_dec2 / 1e9
    ratio2 = len(text) / total2
    ratio2_vs_lz4 = total2 / lz4_total2 if lz4_total2 else None
    _log(f"config 2: decode {dec2_gbps:.3f} GB/s (nseq-hinted), ratio "
         f"{ratio2:.3f}, size vs lz4 {ratio2_vs_lz4}")

    # --- config 3: bdev-style 4 KiB chunks, zero/random mix ---
    rng = np.random.RandomState(77)
    chunks = []
    for _ in range(4096):  # 16 MiB: 4 MiB measured too noisy even with
        # escalated repeat counts (run-to-run spread 2.5-7.2 GB/s)
        if rng.rand() < 0.5:
            chunks.append(np.zeros(4096, np.uint8))
        else:
            chunks.append(rng.randint(0, 256, 4096).astype(np.uint8))
    raw4 = np.stack(chunks)
    rlen4 = np.full(4096, 4096, np.int32)
    raw4_d = jax.device_put(raw4, dev)
    rlen4_d = jax.device_put(rlen4, dev)

    def run_enc4():
        comp, clen = compress_blocks_device(raw4_d, rlen4_d, 4096)
        return comp, clen, int(jnp.sum(clen))

    def launch_enc4(n):
        acc = None
        for _ in range(n):
            comp, clen = compress_blocks_device(raw4_d, rlen4_d, 4096)
            s = jnp.sum(clen) + jnp.sum(comp[0, :8].astype(jnp.int32))
            acc = s if acc is None else acc + s
        return int(acc)

    _log("config 3 (4 KiB bdev mix): encode...")
    comp4_dev, clen4, total4 = run_enc4()
    t_enc4 = _time_diff(launch_enc4, K=2)
    slot4 = comp4_dev.shape[1] + 8
    comp4 = jnp.pad(comp4_dev, ((0, 0), (0, slot4 - comp4_dev.shape[1])))

    def run_dec4():
        out, ln, e = decompress_blocks_device(comp4, clen4, 4096)
        return int(jnp.sum(e)), int(jnp.sum(ln))

    def launch_dec4(n):
        acc = None
        for _ in range(n):
            out, ln, e = decompress_blocks_device(comp4, clen4, 4096)
            s = jnp.sum(ln) + jnp.sum(e)
            acc = s if acc is None else acc + s
        return int(acc)

    errs4, lens4 = run_dec4()
    assert errs4 == 0 and lens4 == raw4.size, (errs4, lens4)
    t_dec4 = _time_diff(launch_dec4)
    enc4_gbps = raw4.size / t_enc4 / 1e9
    dec4_gbps = raw4.size / t_dec4 / 1e9
    _log(f"config 3: encode {enc4_gbps:.3f} GB/s, "
         f"decode {dec4_gbps:.3f} GB/s, ratio {raw4.size / total4:.3f}")

    # --- config 5: deep-match mode on a REAL distinct corpus ---
    # The engine is the enc3 depth-3 kernel mode (best-of-3 chain
    # candidates per probe, golden.compress_deep semantics) — fast enough
    # to run a genuinely distinct >= 128 MiB corpus, no tiling proxy.
    deep_mib = int(os.environ.get("LZ4J_DEEP_MIB", "128"))
    base5 = _synth_corpus(deep_mib << 20, seed=1234)
    raw5_np, rlen5_np = split_blocks(base5, BLOCK_SIZE)
    raw5 = jax.device_put(raw5_np, dev)
    rlen5 = jax.device_put(rlen5_np, dev)

    def run_deep():
        c, cl = compress_blocks_device(raw5, rlen5, BLOCK_SIZE,
                                       match_depth=3)
        return c, cl, int(jnp.sum(cl))

    _log(f"config 5 (deep match, {deep_mib} MiB distinct corpus): "
         "compiling...")
    t0 = time.perf_counter()
    comp5, clen5, deep_total = _retry(run_deep)
    _log(f"deep warmup+compile {time.perf_counter() - t0:.1f}s")
    # decode-verify the deep stream on device (cross-engine: deep encode,
    # lockstep decode)
    comp5p = jnp.pad(comp5, ((0, 0), (0, 8)))
    out5, ln5, e5 = decompress_blocks_device(comp5p, clen5, BLOCK_SIZE)
    assert int(jnp.sum(e5)) == 0
    valid5 = jnp.arange(BLOCK_SIZE)[None, :] < rlen5[:, None]
    assert int(jnp.sum(jnp.where(valid5, out5 != raw5, False))) == 0
    t_deep = _time_diff(lambda k: sum(
        run_deep()[2] for _ in range(k)), K=1, reps=2)
    deep_gbps = len(base5) / t_deep / 1e9
    deep_ratio5 = len(base5) / deep_total
    deep_vs_lz4 = None
    if oracle.available():
        lz4_total5 = sum(
            len(oracle.compress(base5[i:i + BLOCK_SIZE]))
            for i in range(0, len(base5), BLOCK_SIZE))
        deep_vs_lz4 = deep_total / lz4_total5
    _log(f"config 5: deep encode {deep_gbps:.4f} GB/s, ratio "
         f"{deep_ratio5:.3f}, size vs lz4 {deep_vs_lz4}")
    # the exhaustive XLA engine stays the max-ratio mode; record its
    # size envelope on a small slice (it runs ~0.0002 GB/s on TPU)
    from lz4_sgori_tpu.ops.encode import _compress_blocks_impl
    rawx = raw5[:16]
    rlenx = rlen5[:16]
    cx, clx = _compress_blocks_impl(rawx, rlenx, BLOCK_SIZE, 3)
    xla_total = int(jnp.sum(clx))
    xla_vs_lz4 = None
    if oracle.available():
        lz4x = sum(len(oracle.compress(base5[i * BLOCK_SIZE:
                                             (i + 1) * BLOCK_SIZE]))
                   for i in range(16))
        xla_vs_lz4 = xla_total / lz4x
    _log(f"config 5b: XLA max-ratio engine size vs lz4 {xla_vs_lz4}")
    # depth-5 kernel mode (round 4: the dense_gaps2 second chain tape,
    # fed by a second gaps2-only pass-1 call so peak VMEM stays at the
    # depth-3 level) on an 8 MiB slice at the SAME 64 KiB blocks as
    # config 5: matches the XLA engine's ratio class at kernel speed
    # (0.9171x vs 0.9141x; depth 3 measures 0.9304x)
    n5c = (8 << 20) // BLOCK_SIZE
    c5c, cl5c = _retry(lambda: compress_blocks_device(
        raw5[:n5c], rlen5[:n5c], BLOCK_SIZE, match_depth=5))
    d5_total = int(jnp.sum(cl5c))
    deep5_vs_lz4 = None
    if oracle.available():
        lz45c = sum(len(oracle.compress(base5[i * BLOCK_SIZE:
                                              (i + 1) * BLOCK_SIZE]))
                    for i in range(n5c))
        deep5_vs_lz4 = d5_total / lz45c
    _log(f"config 5c: depth-5 kernel (64 KiB blocks) size vs lz4 "
         f"{deep5_vs_lz4}")

    # --- large blocks: 1 MiB (the fio envelope's upper half; closes the
    # round-3 ratio blind spot where the old 64 KiB splice truncated the
    # window at segment starts — the seg engine now carries candidates
    # across piece boundaries, golden.dense_candidates_piecewise) ---
    bs6 = 1 << 20
    # 128 blocks = one full 128-lane lockstep group (32 MiB measured the
    # same kernel at 25% lane occupancy: 0.092 vs 0.174 GB/s)
    big_mib = int(os.environ.get("LZ4J_BIG_MIB", "128"))
    data6 = _synth_corpus(big_mib << 20, seed=55)
    raw6_np, rlen6_np = split_blocks(data6, bs6)
    raw6 = jax.device_put(raw6_np, dev)
    rlen6 = jax.device_put(rlen6_np, dev)

    def run_enc6():
        # return_cost: per-block sequence counts, threaded to the v8
        # decode below as its lane-grouping hint (round-4 verdict weak
        # #8: the hint channel was unexercised exactly where decode
        # throughput is worst)
        c, cl, cost = compress_blocks_device(raw6, rlen6, bs6,
                                             return_cost=True)
        return c, cl, cost, int(jnp.sum(cl))

    _log(f"config 6 (1 MiB blocks, {big_mib} MiB): compiling encode...")
    comp6, clen6, cost6, total6 = _retry(run_enc6)
    # liblz4 must decode every block bit-exactly (cross-implementation
    # contract) and the size contract holds per aggregate
    clen6_np = np.asarray(clen6)
    comp6_np = np.asarray(comp6)
    big_vs_lz4 = None
    lz4_total6 = 0
    for j in range(raw6_np.shape[0]):
        blk = data6[j * bs6:(j + 1) * bs6]
        assert clen6_np[j] > 0, f"block {j} fell back"
        got = oracle.decompress(comp6_np[j, :clen6_np[j]].tobytes(),
                                len(blk)) if oracle.available() else None
        if got is not None:
            assert got == blk, f"liblz4 decode mismatch at 1 MiB block {j}"
            lz4_total6 += len(oracle.compress(blk))
    if lz4_total6:
        big_vs_lz4 = total6 / lz4_total6
    t_enc6 = _time_diff(lambda k: sum(run_enc6()[3] for _ in range(k)),
                        K=1, reps=2)
    enc6_gbps = len(data6) / t_enc6 / 1e9
    _log(f"config 6: 1 MiB-block encode {enc6_gbps:.4f} GB/s, "
         f"ratio {len(data6) / total6:.3f}, size vs lz4 {big_vs_lz4}")

    # 1 MiB decode on the v8 HBM-tape kernel (the round-3 verdict's
    # "publish a >= 1 MiB decode GB/s row")
    comp6p = jnp.pad(comp6, ((0, 0), (0, 8)))

    def launch_dec6(n):
        acc = None
        for _ in range(n):
            out, ln, e = decompress_blocks_device(comp6p, clen6, bs6,
                                                  cost_key=cost6)
            s = jnp.sum(ln) + jnp.sum(e)
            acc = s if acc is None else acc + s
        return int(acc)

    _log("config 6: compiling 1 MiB decode (v8)...")
    out6, ln6, e6 = _retry(
        lambda: decompress_blocks_device(comp6p, clen6, bs6,
                                         cost_key=cost6))
    assert int(jnp.sum(e6)) == 0, "1 MiB decode errors"
    valid6 = jnp.arange(bs6)[None, :] < rlen6[:, None]
    assert int(jnp.sum(jnp.where(valid6, out6 != raw6, False))) == 0
    t_dec6 = _time_diff(launch_dec6, K=2)
    dec6_gbps = len(data6) / t_dec6 / 1e9
    _log(f"config 6: 1 MiB-block decode {dec6_gbps:.4f} GB/s")

    # per-row engine provenance (round-4 verdict item 10): every GB/s
    # row names the engine that produced it so cross-round comparisons
    # survive dispatch changes. Derived from THE routing table.
    from lz4_sgori_tpu.ops import routing
    on_tpu = jax.default_backend() == "tpu"
    engines = {
        "headline_decode": routing.select_decode_engine(BLOCK_SIZE, on_tpu),
        "headline_encode": routing.select_encode_engine(BLOCK_SIZE, 1,
                                                        on_tpu),
        "enwik8_256k_decode": routing.select_decode_engine(bs2, on_tpu),
        "enwik8_256k_encode": "liblz4-host (device seg_big measured "
                              "1.1389x on this corpus: 64 KiB-window "
                              "class vs full-window lz4 at 256 KiB)",
        "bdev_4k_decode": routing.select_decode_engine(4096, on_tpu),
        "bdev_4k_encode": routing.select_encode_engine(4096, 1, on_tpu),
        "deep_encode": routing.select_encode_engine(BLOCK_SIZE, 3, on_tpu),
        "deep5_encode": routing.select_encode_engine(BLOCK_SIZE, 5, on_tpu),
        "big_1m_encode": routing.select_encode_engine(bs6, 1, on_tpu),
        "big_1m_decode": routing.select_decode_engine(bs6, on_tpu),
    }

    vs_baseline = (dec_gbps / base_dec_gbps) if base_dec_gbps else None
    print(json.dumps({
        "metric": "decompress_gbps_silesia_like_64k_blocks",
        "value": round(dec_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        "device": str(dev),
        "corpus_mb": CORPUS_MB,
        "encode_gbps": round(enc_gbps, 4),
        "encode_vs_lz4": (round(enc_gbps / base_enc_gbps, 4)
                          if base_enc_gbps else None),
        "ratio": round(len(data) / comp_total, 4),
        "compressed_size_vs_lz4": (round(ratio_vs_lz4, 4)
                                   if ratio_vs_lz4 else None),
        "baseline_liblz4_decode_gbps": (round(base_dec_gbps, 4)
                                        if base_dec_gbps else None),
        "enwik8_256k_decode_gbps": round(dec2_gbps, 4),
        "enwik8_256k_ratio": round(ratio2, 4),
        "enwik8_256k_size_vs_lz4": (round(ratio2_vs_lz4, 4)
                                    if ratio2_vs_lz4 else None),
        "bdev_4k_mix_encode_gbps": round(enc4_gbps, 4),
        "bdev_4k_mix_decode_gbps": round(dec4_gbps, 4),
        "bdev_4k_mix_ratio": round(raw4.size / total4, 4),
        "deep_encode_gbps": round(deep_gbps, 5),
        "deep_ratio": round(deep_ratio5, 4),
        "deep_size_vs_lz4": (round(deep_vs_lz4, 4)
                             if deep_vs_lz4 else None),
        "deep_corpus": f"{deep_mib}MiB distinct (enc3 depth-3 kernel)",
        "deep_xla_size_vs_lz4": (round(xla_vs_lz4, 4)
                                 if xla_vs_lz4 else None),
        "deep5_size_vs_lz4": (round(deep5_vs_lz4, 4)
                              if deep5_vs_lz4 else None),
        "baseline_protocol": baseline_protocol,
        "hbm_peak_gbps": hbm_peak,
        "hbm_fraction": (round(dec_gbps / hbm_peak, 5)
                         if hbm_peak else None),
        "decode_scaling_gbps": scaling,
        "big_1m_encode_gbps": round(enc6_gbps, 4),
        "big_1m_decode_gbps": round(dec6_gbps, 4),
        "big_1m_ratio": round(len(data6) / total6, 4),
        "big_1m_size_vs_lz4": (round(big_vs_lz4, 4)
                               if big_vs_lz4 else None),
        "engines": engines,
    }))


if __name__ == "__main__":
    main()
