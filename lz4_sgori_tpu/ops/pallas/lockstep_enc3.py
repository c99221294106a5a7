"""Lane-lockstep LZ4 encoder v3: sort-based candidates + fused parse.

enc2 (lockstep_enc2.py, superseded) computed its dense candidates with a
fused get+put walk over a per-lane 8192-row hash table: every 16
positions paid ~3 vector ops per query per 64-row band, 117 ms per
8 MiB group on v5e — per-query cost scales with table rows, which is
architecturally unfixable. enc3 reformulates pass 1 as a SORT:

    cand[p] = latest q < p with hash16(v32(q)) == hash16(v32(p))

is exactly "previous row with the same key" after sorting
``key = hash16 << 16 | pos`` — buckets become contiguous runs ordered
by position, one rolled neighbor-compare reads every candidate at once,
and a second sort by ``pos << 16 | d16`` scatters the results back to
position order. Both sorts are bitonic compare-exchange networks along
sublanes (static rolls + min/max + selects — the cheapest ops on this
machine), executed per 16K-row chunk with an explicit merge tree so no
roll ever materializes more than a (16384,128) temporary.

hash16 (not the reference's hash13, lz4e_compress.c:59-66) because the
sort key has exactly 16 spare bits and finer buckets both improve the
ratio (measured 0.990x vs LZ4_compress_default on the bench corpus,
0.964x on text — vs 0.996x/0.996x for hash13) and cut the false-probe
rate (8-10% vs 32-41%). The byte contract is golden.compress_dense
(hashlog=16): candidates need no val16 prefilter because the parse
re-verifies every probe with a read32 compare, so prefiltering changes
probe economy, never bytes.

Pass 2 is enc2's lockstep greedy parse (skip schedule, catch-up,
extension, LSIC emission — lz4e_compress.c:218-534 semantics) with the
round-2 verdict's hot costs removed:

  * mode histogram on v5e showed 48% of lane-rounds idle (stragglers)
    and ~3 live rounds per sequence (SRCH/VFY/EMIT 1:1:1) with 4-5
    banded tape walks firing nearly every round;
  * emission is now fused into the verify round whenever the literal
    run fits the verify window (lit + catchup <= 15 covers most text
    sequences), collapsing VFY+EMIT into one round;
  * the separate literal-stream window is folded into the per-mode
    primary window (one walk fewer per round);
  * blocks are re-grouped between passes by pass-1 candidate density
    (a strong sequence-count proxy), so slow blocks share groups and
    fast groups retire early instead of idling next to stragglers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import format as F
from . import lockstep as LK
from .lockstep import (
    CAP, CAPW,
    _iota_rows, _bcast,
    funnel, byte_mask,
)
from .lockstep_v4 import BAND, extract_bytes_banded, extract_rows_banded
from .lockstep_v6 import FH, flush_ring, place_ring

LANES = LK.LANES
BIG = 0x40000000

HASHLOG = 16                 # compress_dense(hashlog=16) contract
K1 = 16                      # pass-2 probes per search round
LCP = 128                    # cand window rows (2 packed positions/row)
WPOS = 2 * LCP               # 256 positions per window: halves refills
SRO = 512                    # output staging ring rows (2 KiB)
CHUNK = 4096                 # bitonic sort chunk rows (bounds VMEM temps)
_HASH4_MUL = F.HASH4_PRIME - (1 << 32)   # int32-wrapped Knuth prime

# pass-2 lane modes
SRCH = 0      # skip-schedule batch probe over the cand window
VFY = 1       # banded candidate read -> verify + catch-up + extension
PREP = 2      # catch-up continuation (ran past its 16-byte window)
EXT = 3       # forward extension continuation
EMIT = 4      # one-round emission fallback (fused path missed)
HDR = 5       # token + literal-LSIC stream
LIT = 6       # literal copy stream
TAIL = 7      # offset + match-LSIC stream
FHDR = 8      # last-literals token + LSIC
FLIT = 9      # last-literals copy
DONE = 10


def _r32(win, j: int):
    """Static-offset unaligned LE32 read from a byte-aligned window."""
    lo = win[j // 4:j // 4 + 1]
    sh = (j % 4) * 8
    if sh == 0:
        return lo
    hi = win[j // 4 + 1:j // 4 + 2]
    return LK.shift_right_u(lo, sh) | LK.shift_left_u(hi, 32 - sh)


def _lead_eq(wa, wb):
    """Per-lane count of leading equal bytes of two (W,128) windows."""
    w = wa.shape[0]
    x = wa ^ wb
    idx = _iota_rows(w)
    w1 = jnp.min(jnp.where(x != 0, idx, w), axis=0, keepdims=True)
    xw = jnp.sum(jnp.where(idx == _bcast(w1, w), x, 0), axis=0,
                 keepdims=True)
    b0 = ((xw & 0xFF) == 0).astype(jnp.int32)
    b1 = ((xw & 0xFF00) == 0).astype(jnp.int32)
    b2 = ((xw & jnp.int32(0xFF0000)) == 0).astype(jnp.int32)
    tz = b0 + b0 * b1 + b0 * b1 * b2
    return jnp.where(w1 == w, 4 * w, 4 * w1 + tz)


def _at_byte(val_word, pos, nbytes, w: int):
    """(w,128) image with `nbytes` low bytes of val_word at byte offset
    pos (pos + nbytes <= 4*w)."""
    img = jnp.concatenate(
        [val_word, jnp.zeros((w - 1, LANES), jnp.int32)], axis=0)
    img = LK.byteshift_down(LK.rotate_down(img, pos >> 2, w), pos & 3)
    return img & LK.byte_mask(w, pos, pos + nbytes)


def _trail_eq16(wa, wb):
    """Count of trailing equal bytes among bytes [0,16) of two windows
    (compared from byte 15 down — the catch-up direction)."""
    tc = jnp.zeros((1, LANES), jnp.int32)
    live = jnp.ones((1, LANES), bool)
    for k in range(15, -1, -1):
        eq = LK._sb(wa, k) == LK._sb(wb, k)
        live = live & eq
        tc = tc + live.astype(jnp.int32)
    return tc


# ---------------------------------------------------------------------------
# Pass 1: bitonic-sort dense candidates
#
# The sort array lives in the cand output ref; every stage loads/stores
# CHUNK-row slices so values stay register-allocator-sized (a monolithic
# (65536,128) value measured 256 MB of spill slots). Chunks are bitonic-
# sorted with the classic iterative network: sort chunk c in direction
# parity(c), then for run sizes m = 2,4..nch merge with cross-chunk
# min/max rounds (chunk distance m/2..1) followed by a uniform-direction
# in-chunk merge, run direction = parity(c // m).
# ---------------------------------------------------------------------------


def _exchange(x, dist: int, keep_min, iota):
    """One compare-exchange at row distance `dist` (< rows): row pairs
    (i, i+dist) with bit `dist` of i clear; keep_min (rows,128) bool =
    this row keeps the pair minimum. One roll fetches the partner, one
    sends the other half back."""
    n = x.shape[0]
    fwd = jnp.roll(x, n - dist, axis=0)          # row i reads x[i+dist]
    mnf = jnp.minimum(x, fwd)
    mxf = jnp.maximum(x, fwd)
    keepf = jnp.where(keep_min, mnf, mxf)        # value kept at bit-0 rows
    sendf = jnp.where(keep_min, mxf, mnf)        # value for bit-1 rows
    bit0 = (iota & dist) == 0
    return jnp.where(bit0, keepf, jnp.roll(sendf, dist, axis=0))


def _exchange_p(x, ps, dist: int, keep_min, iota):
    """_exchange with payload tuples permuted by the key decision.
    Keys must be UNIQUE (they are: hash16 << 16 | pos); `took` detects
    whether the kept value came from the partner row."""
    n = x.shape[0]
    fwd = jnp.roll(x, n - dist, axis=0)
    mnf = jnp.minimum(x, fwd)
    mxf = jnp.maximum(x, fwd)
    keepf = jnp.where(keep_min, mnf, mxf)
    sendf = jnp.where(keep_min, mxf, mnf)
    took = keepf == fwd
    bit0 = (iota & dist) == 0
    x2 = jnp.where(bit0, keepf, jnp.roll(sendf, dist, axis=0))
    ps2 = []
    for pv in ps:
        pf = jnp.roll(pv, n - dist, axis=0)
        kp = jnp.where(took, pf, pv)
        sp = jnp.where(took, pv, pf)
        ps2.append(jnp.where(bit0, kp, jnp.roll(sp, dist, axis=0)))
    return x2, tuple(ps2)


def _sort_ref_p(ref, prefs, g, NP: int):
    """_sort_ref carrying payload refs permuted identically (the
    round-5 mlen-precompute design; payload traffic multiplies the
    bandwidth-bound stage cost ~(1 + #payloads)). Keys must be unique."""
    ch = min(CHUNK, NP)
    nch = NP // ch
    iota = _iota_rows(ch)
    logch = ch.bit_length() - 1

    def sort_chunk(c, carry):
        x = ref[g, pl.ds(c * ch, ch), :]
        ps = tuple(r[pl.ds(c * ch, ch), :] for r in prefs)
        flip = _bcast((c & 1) == 1, ch)
        for j in range(logch):
            for k in range(j, -1, -1):
                up = (((iota >> (j + 1)) & 1) == 0) ^ flip
                x, ps = _exchange_p(x, ps, 1 << k, up, iota)
        ref[g, pl.ds(c * ch, ch), :] = x
        for r, pv in zip(prefs, ps):
            r[pl.ds(c * ch, ch), :] = pv
        return carry

    jax.lax.fori_loop(0, nch, sort_chunk, 0)

    m = 2
    while m <= nch:
        dd = m // 2
        while dd >= 1:
            def cross(t, carry, dd=dd, m=m):
                blk = t // dd
                off = t - blk * dd
                i = blk * 2 * dd + off
                a = ref[g, pl.ds(i * ch, ch), :]
                b = ref[g, pl.ds((i + dd) * ch, ch), :]
                asc = _bcast(((i // m) & 1) == 0, ch)
                mn = jnp.minimum(a, b)
                mx = jnp.maximum(a, b)
                oa = jnp.where(asc, mn, mx)
                took = oa == b
                ref[g, pl.ds(i * ch, ch), :] = oa
                ref[g, pl.ds((i + dd) * ch, ch), :] = \
                    jnp.where(asc, mx, mn)
                for r in prefs:
                    pa = r[pl.ds(i * ch, ch), :]
                    pb = r[pl.ds((i + dd) * ch, ch), :]
                    r[pl.ds(i * ch, ch), :] = jnp.where(took, pb, pa)
                    r[pl.ds((i + dd) * ch, ch), :] = \
                        jnp.where(took, pa, pb)
                return carry

            jax.lax.fori_loop(0, nch // 2, cross, 0)
            dd //= 2

        def intra(c, carry, m=m):
            x = ref[g, pl.ds(c * ch, ch), :]
            ps = tuple(r[pl.ds(c * ch, ch), :] for r in prefs)
            asc = _bcast(((c // m) & 1) == 0, ch)
            for k in range(logch - 1, -1, -1):
                x, ps = _exchange_p(x, ps, 1 << k, asc, iota)
            ref[g, pl.ds(c * ch, ch), :] = x
            for r, pv in zip(prefs, ps):
                r[pl.ds(c * ch, ch), :] = pv
            return carry

        jax.lax.fori_loop(0, nch, intra, 0)
        m *= 2


def _sort_ref_hbm(ref, prefs, stg, sem, g, NP: int):
    """_sort_ref_p with the payload tapes resident in HBM (pl.ANY refs).

    At NP = 65536 the four payload tapes are 128 MB — far past VMEM —
    so every chunk operation brackets its payload work with DMA:
    chunk-local stages load/store one 4096-row chunk per payload
    (stg[0..3]); cross-chunk merges stage a chunk PAIR (stg[0..7]).
    Payload DMA traffic is ~160 chunk-ops x 16 MB ~ 2.6 GB per group
    (~3-4 ms at HBM bandwidth) — the VMEM-bandwidth stage-cost
    multiplier of the in-VMEM variant applies only to chunk-local
    stages here. Keys stay in the (VMEM) ref and sort exactly as
    _sort_ref. Keys must be unique."""
    NPAY = len(prefs)
    ch = min(CHUNK, NP)
    nch = NP // ch
    iota = _iota_rows(ch)
    logch = ch.bit_length() - 1

    def dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    def sort_chunk(c, carry):
        x = ref[g, pl.ds(c * ch, ch), :]
        for k2 in range(NPAY):
            dma(prefs[k2].at[g, pl.ds(c * ch, ch), :], stg[k2])
        ps = tuple(stg[k2][...] for k2 in range(NPAY))
        flip = _bcast((c & 1) == 1, ch)
        for j in range(logch):
            for k in range(j, -1, -1):
                up = (((iota >> (j + 1)) & 1) == 0) ^ flip
                x, ps = _exchange_p(x, ps, 1 << k, up, iota)
        ref[g, pl.ds(c * ch, ch), :] = x
        for k2 in range(NPAY):
            stg[k2][...] = ps[k2]
            dma(stg[k2], prefs[k2].at[g, pl.ds(c * ch, ch), :])
        return carry

    jax.lax.fori_loop(0, nch, sort_chunk, 0)

    m = 2
    while m <= nch:
        dd = m // 2
        while dd >= 1:
            def cross(t, carry, dd=dd, m=m):
                blk = t // dd
                off = t - blk * dd
                i = blk * 2 * dd + off
                a = ref[g, pl.ds(i * ch, ch), :]
                b = ref[g, pl.ds((i + dd) * ch, ch), :]
                asc = _bcast(((i // m) & 1) == 0, ch)
                mn = jnp.minimum(a, b)
                mx = jnp.maximum(a, b)
                oa = jnp.where(asc, mn, mx)
                took = oa == b
                ref[g, pl.ds(i * ch, ch), :] = oa
                ref[g, pl.ds((i + dd) * ch, ch), :] = \
                    jnp.where(asc, mx, mn)
                for k2 in range(NPAY):
                    dma(prefs[k2].at[g, pl.ds(i * ch, ch), :], stg[k2])
                    dma(prefs[k2].at[g, pl.ds((i + dd) * ch, ch), :],
                        stg[NPAY + k2])
                    pa = stg[k2][...]
                    pb = stg[NPAY + k2][...]
                    stg[k2][...] = jnp.where(took, pb, pa)
                    stg[NPAY + k2][...] = jnp.where(took, pa, pb)
                    dma(stg[k2], prefs[k2].at[g, pl.ds(i * ch, ch), :])
                    dma(stg[NPAY + k2],
                        prefs[k2].at[g, pl.ds((i + dd) * ch, ch), :])
                return carry

            jax.lax.fori_loop(0, nch // 2, cross, 0)
            dd //= 2

        def intra(c, carry, m=m):
            x = ref[g, pl.ds(c * ch, ch), :]
            for k2 in range(NPAY):
                dma(prefs[k2].at[g, pl.ds(c * ch, ch), :], stg[k2])
            ps = tuple(stg[k2][...] for k2 in range(NPAY))
            asc = _bcast(((c // m) & 1) == 0, ch)
            for k in range(logch - 1, -1, -1):
                x, ps = _exchange_p(x, ps, 1 << k, asc, iota)
            ref[g, pl.ds(c * ch, ch), :] = x
            for k2 in range(NPAY):
                stg[k2][...] = ps[k2]
                dma(stg[k2], prefs[k2].at[g, pl.ds(c * ch, ch), :])
            return carry

        jax.lax.fori_loop(0, nch, intra, 0)
        m *= 2


def _sort_ref(ref, g, NP: int):
    """Ascending bitonic sort of ref[g] ((NP,128) int32 rows) in place."""
    ch = min(CHUNK, NP)
    nch = NP // ch
    iota = _iota_rows(ch)
    logch = ch.bit_length() - 1

    def sort_chunk(c, carry):
        x = ref[g, pl.ds(c * ch, ch), :]
        flip = _bcast((c & 1) == 1, ch)          # descending chunks
        for j in range(logch):
            for k in range(j, -1, -1):
                up = (((iota >> (j + 1)) & 1) == 0) ^ flip
                x = _exchange(x, 1 << k, up, iota)
        ref[g, pl.ds(c * ch, ch), :] = x
        return carry

    jax.lax.fori_loop(0, nch, sort_chunk, 0)

    m = 2
    while m <= nch:
        dd = m // 2
        while dd >= 1:
            def cross(t, carry, dd=dd, m=m):
                blk = t // dd
                off = t - blk * dd
                i = blk * 2 * dd + off
                a = ref[g, pl.ds(i * ch, ch), :]
                b = ref[g, pl.ds((i + dd) * ch, ch), :]
                asc = _bcast(((i // m) & 1) == 0, ch)
                mn = jnp.minimum(a, b)
                mx = jnp.maximum(a, b)
                ref[g, pl.ds(i * ch, ch), :] = jnp.where(asc, mn, mx)
                ref[g, pl.ds((i + dd) * ch, ch), :] = jnp.where(asc, mx, mn)
                return carry

            jax.lax.fori_loop(0, nch // 2, cross, 0)
            dd //= 2

        def intra(c, carry, m=m):
            x = ref[g, pl.ds(c * ch, ch), :]
            asc = _bcast(((c // m) & 1) == 0, ch)
            for k in range(logch - 1, -1, -1):
                x = _exchange(x, 1 << k, asc, iota)
            ref[g, pl.ds(c * ch, ch), :] = x
            return carry

        jax.lax.fori_loop(0, nch, intra, 0)
        m *= 2


def _cand_kernel(src_ref, n_ref, cand_ref, *rest, NP: int,
                 depth: int = 1, gaps2_only: bool = False,
                 mlen_mode: bool = False, mlen_hbm: bool = False):
    """Dense hash16 candidates for one 128-lane group.

    Writes cand_ref rows p = (p << 16) | d16[p] (d16 in the low half —
    the parse masks & 0xFFFF) and dens_ref = per-lane count of
    candidate-bearing positions (the pass-2 grouping key). depth > 1
    additionally writes gaps_ref rows p = (p << 16) | g2 | g3 << 8 —
    the chain gaps to the 2nd/3rd most recent same-bucket positions
    (golden.dense_gaps), read as rolled rows 2/3 of the bucket sort.
    gaps2_only: the single output tape carries g4 | g5 << 8 to the
    4th/5th chain entries instead of d16 (golden.dense_gaps2, rolled
    rows 4/5) — the depth-5 mode's SECOND pass-1 invocation, kept
    separate so peak VMEM stays at the depth-3 level (a third NP-row
    output alongside cand+gaps measured 154M vs the 128M budget at
    64 KiB blocks).
    """
    pv32_ref = pw4_ref = pw8_ref = pbm1_ref = None
    stg = sem = None
    if mlen_hbm:
        # payload tapes in HBM (pl.ANY outputs); 8 staging chunks + sem.
        # There is no separate VMEM mcode tape: d16 writes the mcode
        # words into pv32 (dead after verification) and sort 2 carries
        # them as the payload of the cand sort — a 32 MB VMEM window
        # and a full NP-row bitonic sort cheaper than the in-VMEM
        # variant's independent mcode sort (the r5 VMEM OOM fix).
        (pv32_ref, pw4_ref, pw8_ref, pbm1_ref, dens_ref,
         *stg_sem) = rest
        stg = stg_sem[:8]
        sem = stg_sem[8]
        gaps_ref = mcode_ref = None
        mlen_mode = True
    elif mlen_mode:
        mcode_ref, dens_ref, pv32_ref, pw4_ref, pw8_ref, pbm1_ref = rest
        gaps_ref = None
    elif depth > 1:
        gaps_ref, dens_ref = rest
    else:
        dens_ref, = rest
    g = 0
    n = n_ref[0]
    np4 = NP // 4
    ch = min(CHUNK, NP)
    nch = NP // ch

    # ---- keys: hash16(v32(p)) << 16 | p, one phase tape per byte lane;
    # row order before sort 1 is irrelevant (pos is in the key) ----
    if mlen_hbm:
        # Chunk-wise generation: whole-np4 values at 64 KiB blocks are
        # 8 MB EACH and ~10 are live through the phase loop — measured
        # 100.8 MB of register-allocator spill slots on hardware (the
        # r5 VMEM OOM). Slicing the reads bounds every live value to
        # one staging chunk (2 MB).
        STGR = stg[0].shape[0]
        nsl = -(-np4 // STGR)
        for f in range(4):
            for sl in range(nsl):
                r0 = sl * STGR
                r1 = min(np4, r0 + STGR)
                m_ = r1 - r0
                a0 = src_ref[g, r0:r1, :]
                a1 = src_ref[g, r0 + 1:r1 + 1, :]
                a2 = src_ref[g, r0 + 2:r1 + 2, :]
                a3 = src_ref[g, r0 + 3:r1 + 3, :]
                if r0 == 0:
                    am = jnp.concatenate(
                        [jnp.zeros((1, LANES), jnp.int32),
                         src_ref[g, 0:r1 - 1, :]], axis=0)
                else:
                    am = src_ref[g, r0 - 1:r1 - 1, :]
                if f == 0:
                    v, w4, w8, bm1 = a0, a1, a2, am
                else:
                    v = LK.shift_right_u(a0, 8 * f) \
                        | LK.shift_left_u(a1, 32 - 8 * f)
                    w4 = LK.shift_right_u(a1, 8 * f) \
                        | LK.shift_left_u(a2, 32 - 8 * f)
                    w8 = LK.shift_right_u(a2, 8 * f) \
                        | LK.shift_left_u(a3, 32 - 8 * f)
                    bm1 = LK.shift_right_u(am, 8 * f) \
                        | LK.shift_left_u(a0, 32 - 8 * f)
                h16 = LK.shift_right_u(v * _HASH4_MUL, 32 - HASHLOG)
                cand_ref[g, pl.ds(f * np4 + r0, m_), :] = \
                    LK.shift_left_u(h16, 16) \
                    | ((_iota_rows(m_) + r0) * 4 + f)
                for k2, val in enumerate((v, w4, w8, bm1)):
                    pref = (pv32_ref, pw4_ref, pw8_ref, pbm1_ref)[k2]
                    stg[k2][pl.ds(0, m_), :] = val
                    cp = pltpu.make_async_copy(
                        stg[k2].at[pl.ds(0, m_), :],
                        pref.at[g, pl.ds(f * np4 + r0, m_), :], sem)
                    cp.start()
                    cp.wait()
    else:
        t0 = src_ref[g, 0:np4, :]
        t1 = src_ref[g, 1:np4 + 1, :]
    i4 = _iota_rows(np4) * 4
    if mlen_mode and not mlen_hbm:
        # payload tapes in the SAME phase-row order as the keys: the
        # sort permutes them identically. v32(p), w32(p+4), w32(p+8),
        # and w32(p-4) — the raw words of the round-5 exact capped
        # match-length precompute (docs/Performance.md round-5).
        t2 = src_ref[g, 2:np4 + 2, :]
        t3 = src_ref[g, 3:np4 + 3, :]
        tm = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.int32), src_ref[g, 0:np4 - 1, :]],
            axis=0)
    for f in range(0 if mlen_hbm else 4):
        if f == 0:
            v = t0
        else:
            v = LK.shift_right_u(t0, 8 * f) | LK.shift_left_u(t1, 32 - 8 * f)
        h16 = LK.shift_right_u(v * _HASH4_MUL, 32 - HASHLOG)
        cand_ref[g, pl.ds(f * np4, np4), :] = \
            LK.shift_left_u(h16, 16) | (i4 + f)
        if mlen_mode:
            if f == 0:
                w4, w8, bm1 = t1, t2, tm
            else:
                w4 = LK.shift_right_u(t1, 8 * f) \
                    | LK.shift_left_u(t2, 32 - 8 * f)
                w8 = LK.shift_right_u(t2, 8 * f) \
                    | LK.shift_left_u(t3, 32 - 8 * f)
                bm1 = LK.shift_right_u(tm, 8 * f) \
                    | LK.shift_left_u(t0, 32 - 8 * f)
            pv32_ref[pl.ds(f * np4, np4), :] = v
            pw4_ref[pl.ds(f * np4, np4), :] = w4
            pw8_ref[pl.ds(f * np4, np4), :] = w8
            pbm1_ref[pl.ds(f * np4, np4), :] = bm1

    # ---- sort 1 by (hash16, pos): signed order groups buckets and
    # ascends by pos within them (the sign bit is constant per bucket) ----
    if mlen_hbm:
        _sort_ref_hbm(cand_ref, (pv32_ref, pw4_ref, pw8_ref, pbm1_ref),
                      stg, sem, g, NP)
    elif mlen_mode:
        _sort_ref_p(cand_ref, (pv32_ref, pw4_ref, pw8_ref, pbm1_ref),
                    g, NP)
    else:
        _sort_ref(cand_ref, g, NP)

    # ---- d16: previous row in the same bucket is the candidate.
    # Invalid positions (p > n-4: partial tail words, pad) always sort
    # AFTER every valid position of their bucket (pos ascending within a
    # bucket), so masking d16 at invalid rows loses no valid chains.
    # Chunks walk high-to-low: chunk c reads its boundary row from chunk
    # c-1, which is still un-overwritten when c processes. ----
    iota_c = _iota_rows(ch)

    def d16_body(t, carry, nch=nch):
        c = nch - 1 - t
        x = cand_ref[g, pl.ds(c * ch, ch), :]
        # boundary rows via an 8-aligned dynamic read (1-row dynamic
        # slices are not tile-aligned)
        pr8 = cand_ref[g, pl.ds(jnp.maximum(c * ch - 8, 0), 8), :]
        prev = jnp.concatenate([pr8[7:8], x[:ch - 1]], axis=0)
        pos = x & 0xFFFF
        d = (pos - (prev & 0xFFFF)) & 0xFFFF
        bkt = LK.shift_right_u(x, 16)
        same = bkt == LK.shift_right_u(prev, 16)
        valid = pos <= _bcast(n - 4, ch)
        grow = iota_c + c * ch
        first = grow > 0
        d16 = jnp.where(same & valid & first, d, 0)
        if mlen_mode:
            # exact verify + capped lcp/catch-up from the carried raw
            # words of this row and the previous (candidate) row
            if mlen_hbm:
                def prevrow(r, k2):
                    cp = pltpu.make_async_copy(
                        r.at[g, pl.ds(c * ch, ch), :], stg[k2], sem)
                    cp.start()
                    cp.wait()
                    cp2 = pltpu.make_async_copy(
                        r.at[g, pl.ds(jnp.maximum(c * ch - 8, 0), 8), :],
                        stg[4 + k2].at[pl.ds(0, 8), :], sem)
                    cp2.start()
                    cp2.wait()
                    cur = stg[k2][pl.ds(0, ch), :]
                    pr8 = stg[4 + k2][pl.ds(0, 8), :]
                    return cur, jnp.concatenate(
                        [pr8[7:8], cur[:ch - 1]], axis=0)
            else:
                def prevrow(r, k2):
                    cur = r[pl.ds(c * ch, ch), :]
                    pr8 = r[pl.ds(jnp.maximum(c * ch - 8, 0), 8), :]
                    return cur, jnp.concatenate(
                        [pr8[7:8], cur[:ch - 1]], axis=0)

            v32c, v32p = prevrow(pv32_ref, 0)
            w4c, w4p = prevrow(pw4_ref, 1)
            w8c, w8p = prevrow(pw8_ref, 2)
            bm1c, bm1p = prevrow(pbm1_ref, 3)
            vr = (v32c ^ v32p) == 0
            d16 = jnp.where(vr, d16, 0)

            def lead4(yw):
                e0 = ((yw & 0xFF) == 0).astype(jnp.int32)
                e1 = ((yw & 0xFF00) == 0).astype(jnp.int32)
                e2 = ((yw & jnp.int32(0xFF0000)) == 0).astype(jnp.int32)
                e3 = (LK.shift_right_u(yw, 24) == 0).astype(jnp.int32)
                return e0 * (1 + e1 * (1 + e2 * (1 + e3)))

            lcp4 = lead4(w4c ^ w4p)
            lcp = lcp4 + jnp.where(lcp4 == 4, lead4(w8c ^ w8p), 0)
            z = bm1c ^ bm1p
            c3 = (LK.shift_right_u(z, 24) == 0).astype(jnp.int32)
            c2 = ((z & jnp.int32(0xFF0000)) == 0).astype(jnp.int32)
            c1 = ((z & 0xFF00) == 0).astype(jnp.int32)
            c0 = ((z & 0xFF) == 0).astype(jnp.int32)
            cu = c3 * (1 + c2 * (1 + c1 * (1 + c0)))
            mcode = (lcp == 8).astype(jnp.int32) \
                | LK.shift_left_u(lcp, 1) \
                | LK.shift_left_u((cu == 4).astype(jnp.int32), 5) \
                | LK.shift_left_u(cu, 6)
            mcode = jnp.where(d16 != 0, mcode, 0)
            if mlen_hbm:
                # write UNBIASED into the dead pv32 rows (chunks walk
                # high-to-low; rows >= c*ch are never read again):
                # sort 2 carries these as payload, so no key bias and
                # no unbias pass are needed
                stg[0][pl.ds(0, ch), :] = LK.shift_left_u(pos, 16) | mcode
                cp = pltpu.make_async_copy(
                    stg[0].at[pl.ds(0, ch), :],
                    pv32_ref.at[g, pl.ds(c * ch, ch), :], sem)
                cp.start()
                cp.wait()
            else:
                mcode_ref[g, pl.ds(c * ch, ch), :] = \
                    (LK.shift_left_u(pos, 16) | mcode) \
                    ^ jnp.int32(-0x80000000)
        if depth > 1 or gaps2_only:
            prev2 = jnp.concatenate([pr8[6:8], x[:ch - 2]], axis=0)
            prev3 = jnp.concatenate([pr8[5:8], x[:ch - 3]], axis=0)
            same2 = (bkt == LK.shift_right_u(prev2, 16)) & (grow > 1)
            same3 = (bkt == LK.shift_right_u(prev3, 16)) & (grow > 2)
            g2 = (prev & 0xFFFF) - (prev2 & 0xFFFF)
            g3 = (prev2 & 0xFFFF) - (prev3 & 0xFFFF)
            g2ok = (d16 != 0) & same2 & (g2 >= 1) & (g2 <= 254)
            g3ok = g2ok & same3 & (g3 >= 1) & (g3 <= 254)
            if not gaps2_only:
                gaps = jnp.where(g2ok, g2, 0) \
                    | LK.shift_left_u(jnp.where(g3ok, g3, 0), 8)
                gaps_ref[g, pl.ds(c * ch, ch), :] = \
                    (LK.shift_left_u(pos, 16) | gaps) \
                    ^ jnp.int32(-0x80000000)
        if gaps2_only:
            prev4 = jnp.concatenate([pr8[4:8], x[:ch - 4]], axis=0)
            prev5 = jnp.concatenate([pr8[3:8], x[:ch - 5]], axis=0)
            same4 = (bkt == LK.shift_right_u(prev4, 16)) & (grow > 3)
            same5 = (bkt == LK.shift_right_u(prev5, 16)) & (grow > 4)
            g4 = (prev3 & 0xFFFF) - (prev4 & 0xFFFF)
            g5 = (prev4 & 0xFFFF) - (prev5 & 0xFFFF)
            g4ok = g3ok & same4 & (g4 >= 1) & (g4 <= 254)
            g5ok = g4ok & same5 & (g5 >= 1) & (g5 <= 254)
            gaps2 = jnp.where(g4ok, g4, 0) \
                | LK.shift_left_u(jnp.where(g5ok, g5, 0), 8)
            cand_ref[g, pl.ds(c * ch, ch), :] = \
                (LK.shift_left_u(pos, 16) | gaps2) ^ jnp.int32(-0x80000000)
        else:
            # sort-2 key: row p = (p << 16) | d16[p]; pos >= 2^15 flips
            # the sign, so bias to unsigned order (unbiased in the
            # output pass)
            cand_ref[g, pl.ds(c * ch, ch), :] = \
                (LK.shift_left_u(pos, 16) | d16) ^ jnp.int32(-0x80000000)
        return carry

    jax.lax.fori_loop(0, nch, d16_body, 0)

    # ---- sort 2 by pos, then unbias + density ----
    if mlen_hbm:
        # cand sort carries the (HBM) mcode tape as payload: rows land
        # pos-ordered without a second full bitonic network
        _sort_ref_hbm(cand_ref, (pv32_ref,), stg, sem, g, NP)
    else:
        _sort_ref(cand_ref, g, NP)
    if (depth > 1 or mlen_mode) and not mlen_hbm:
        second_ref = mcode_ref if mlen_mode else gaps_ref
        _sort_ref(second_ref, g, NP)

        def unbias_g(c, carry):
            second_ref[g, pl.ds(c * ch, ch), :] = \
                second_ref[g, pl.ds(c * ch, ch), :] \
                ^ jnp.int32(-0x80000000)
            return carry

        jax.lax.fori_loop(0, nch, unbias_g, 0)

    def unbias(c, dens):
        x = cand_ref[g, pl.ds(c * ch, ch), :] ^ jnp.int32(-0x80000000)
        cand_ref[g, pl.ds(c * ch, ch), :] = x
        return dens + jnp.sum((x & 0xFFFF) != 0, axis=0,
                              keepdims=True).astype(jnp.int32)

    dens_ref[0] = jax.lax.fori_loop(
        0, nch, unbias, jnp.zeros((1, LANES), jnp.int32))


def _grid_fits(*buffers) -> bool:
    """True when the double-buffered per-group windows of a multi-group
    grid fit VMEM comfortably (each buffer = rows of (.,128) int32)."""
    return 2 * sum(buffers) * LANES * 4 < 60 * 1024 * 1024


def _cand_call(tapes, nlane, NP: int, interpret: bool, depth: int = 1,
               gaps2_only: bool = False, mlen_mode: bool = False,
               mlen_hbm: bool = False):
    """Small blocks run one multi-group grid; large blocks invoke per
    group (a multi-group grid double-buffers the 32 MB cand output and
    blows VMEM, while per-group output concats of SMALL pieces trigger
    oversized XLA concat fusions — each regime gets the shape it can
    compile). The depth-5 mode's second gaps tape comes from a separate
    gaps2_only invocation (single output tape) so peak VMEM never
    exceeds the depth-3 two-tape level."""
    sw = tapes.shape[1]
    ng = tapes.shape[0]
    if mlen_hbm:
        # payload tapes live in HBM; invoke per group (the VMEM blocks
        # are the cand tape + staging; mcode rides the pv32 HBM tape)
        def mk1():
            return pl.pallas_call(
                functools.partial(_cand_kernel, NP=NP, mlen_hbm=True),
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((1, sw, LANES), lambda g: (g, 0, 0)),
                    pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, NP, LANES), lambda g: (g, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((1, NP, LANES), jnp.int32),
                ] + [jax.ShapeDtypeStruct((1, NP, LANES), jnp.int32)
                     for _ in range(4)] + [
                    jax.ShapeDtypeStruct((1, 1, LANES), jnp.int32),
                ],
                scratch_shapes=[pltpu.VMEM((CHUNK, LANES), jnp.int32)
                                for _ in range(8)]
                + [pltpu.SemaphoreType.DMA(())],
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=126 * 1024 * 1024),
            )

        call = mk1()
        outs = [jax.lax.optimization_barrier(
                    call(tapes[g:g + 1], nlane[g:g + 1]))
                for g in range(ng)]
        return jax.lax.optimization_barrier(tuple(
            jnp.concatenate([o[k] for o in outs], axis=0)
            for k in (0, 1, 5)))           # cand, mcode (pv32), dens
    ntapes = 2 if (depth > 1 or mlen_mode) else 1
    pay = 4 * NP if mlen_mode else 0
    grid_ng = ng if _grid_fits(sw, ntapes * NP + pay) else 1
    big = [pl.BlockSpec((1, NP, LANES), lambda g: (g, 0, 0))
           for _ in range(ntapes)]
    scratch = [pltpu.VMEM((NP, LANES), jnp.int32)
               for _ in range(4)] if mlen_mode else []

    def mk(gn):
        return pl.pallas_call(
            functools.partial(_cand_kernel, NP=NP, depth=depth,
                              gaps2_only=gaps2_only,
                              mlen_mode=mlen_mode),
            grid=(gn,),
            in_specs=[
                pl.BlockSpec((1, sw, LANES), lambda g: (g, 0, 0)),
                pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            ],
            out_specs=big + [
                pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((gn, NP, LANES), jnp.int32)
                       for _ in range(ntapes)] + [
                jax.ShapeDtypeStruct((gn, 1, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=126 * 1024 * 1024),
        )

    if grid_ng == ng:
        return mk(ng)(tapes, nlane)
    call = mk(1)
    # barrier EVERY piece: XLA otherwise fuses the pallas output copies
    # and the concat (and downstream permute gathers) into single
    # fusions whose scoped VMEM overflows (measured 64-96 MB vs 16 MB)
    outs = [jax.lax.optimization_barrier(
                call(tapes[g:g + 1], nlane[g:g + 1]))
            for g in range(ng)]
    return jax.lax.optimization_barrier(tuple(
        jnp.concatenate([o[k] for o in outs], axis=0)
        for k in range(ntapes + 1)))


# ---------------------------------------------------------------------------
# Pass 2: parse & emit
# ---------------------------------------------------------------------------


def _parse_round(st, stag, fl, wa, wb, candw, candb, n, accel: int,
                 wok: bool = True, depth: int = 1, gandw=None,
                 wb2=None, wb3=None, wbb1=None, wbb2=None, wbb3=None,
                 gandw2=None, wb4=None, wb5=None, wbb4=None, wbb5=None,
                 seg_lims=None, lane_ok=None, mlen: bool = False):
    """Advance every live lane one step of its mode.

    Operands loaded by the round wrapper (banded, gated, per round):
      wa   (CAPW,128): the per-mode primary window — src[pos-16 ..] for
           VFY/PREP, src[pos+4+mc ..] for EXT, src[anchor-4 ..] for
           EMIT, src[anchor+ldone ..] for LIT/FLIT;
      wb   (CAPW,128): the matched side (VFY/PREP: mpos-16, EXT:
           mpos+4+mc);
      candw (LCP,128): packed cand rows [candb>>1 ..) — d16 for
           positions [candb, candb + 2*LCP), two per row; candb (1,128)
           even.

    wok (static): whether wa/wb match this round's lane addresses. The
    unrolled sub-round after the loads runs with wok=False: modes that
    consume the windows (VFY/PREP/EXT/EMIT/LIT/FLIT) park — statically
    False gates let XLA fold their whole dataflow away — while SRCH and
    the register-only stream phases (HDR/TAIL/FHDR) keep advancing.
    """
    mode = st["mode"]
    pos, fpos, step, smn = st["pos"], st["fpos"], st["step"], st["smn"]
    anchor, mpos, mc = st["anchor"], st["mpos"], st["mc"]
    lit, d, opos = st["lit"], st["d"], st["opos"]
    hk, ldone = st["hk"], st["ldone"]
    if seg_lims is None:
        mflimit = n - F.MFLIMIT
        matchlimit = n - F.LASTLITERALS
        mlo = 0
        fragb = None
        end_mode = FHDR
    else:
        # segmented-lane mode (golden.compress_dense_seg_parts): per-lane
        # search/match limits, catch-up floor at the block start, no
        # terminal FHDR/FLIT (host assembly emits run headers + raw
        # tails), and a HEADERLESS first sequence on non-block-first
        # lanes (its token + literal-LSIC belong to the previous owner's
        # header).
        mflimit, matchlimit, mlo = seg_lims
        fragb = st["frag"] != 0
        end_mode = DONE
    rspan = SRO * 4
    head = fl * 4 + rspan - opos

    g_srch = mode == SRCH
    g_vfy = (mode == VFY) & wok
    g_prep = (mode == PREP) & wok
    g_ext = (mode == EXT) & wok
    if lane_ok is not None:
        # far-deferred service: unserved lanes park in their window
        # mode this round (their wb span is excluded from the walk).
        # Under mlen the VFY round is window-free arithmetic (the
        # mcode precompute) and is never deferred.
        if not mlen:
            g_vfy = g_vfy & lane_ok
        g_prep = g_prep & lane_ok
        g_ext = g_ext & lane_ok

    # ---- SRCH: batch skip-schedule probes over the cand window ----
    # Loop A marks schedule offsets on the window; probes run while
    # in-window and short of the mflimit exhaustion rule
    # (lz4e_compress.c:298-307: check with the incoming step, advance by
    # it, then draw the next step from smn).
    iot = _iota_rows(LCP)
    mem_lo = jnp.zeros((LCP, LANES), jnp.int32)
    mem_hi = jnp.zeros((LCP, LANES), jnp.int32)
    fp_a, st_a, sm_a = fpos, step, smn
    go = g_srch
    first_ex = jnp.full((1, LANES), BIG, jnp.int32)
    for _ in range(K1):
        ex_i = go & (fp_a + st_a > mflimit + 1)
        first_ex = jnp.where(ex_i & (first_ex == BIG), fp_a - candb,
                             first_ex)
        off = fp_a - candb
        # off < 0: the window was rebased by other lanes' minimum while
        # this lane was mid-sequence — stall until the refill re-bases it
        # probes stop 2 short of the window end so the lazy path can
        # always read position pos+1's candidate record from the window
        probe = go & ~ex_i & (off >= 0) & (off < WPOS - 2)
        row = _bcast(off >> 1, LCP) == iot
        mem_lo = mem_lo | jnp.where(row & _bcast(probe & ((off & 1) == 0),
                                                 LCP), 1, 0)
        mem_hi = mem_hi | jnp.where(row & _bcast(probe & ((off & 1) == 1),
                                                 LCP), 1, 0)
        fp_a = jnp.where(probe, fp_a + st_a, fp_a)
        st_a = jnp.where(probe, LK.shift_right_u(sm_a, F.SKIPTRIGGER),
                         st_a)
        sm_a = jnp.where(probe, sm_a + 1, sm_a)
        go = probe
    d_lo = candw & 0xFFFF
    d_hi = LK.shift_right_u(candw, 16)
    hit_lo = jnp.min(jnp.where((mem_lo != 0) & (d_lo != 0), iot * 2, BIG),
                     axis=0, keepdims=True)
    hit_hi = jnp.min(jnp.where((mem_hi != 0) & (d_hi != 0),
                               iot * 2 + 1, BIG), axis=0, keepdims=True)
    first_hit = jnp.minimum(hit_lo, hit_hi)
    # probes stop at the window edge, so every marked (probed) offset
    # precedes any detected exhaustion point: a hit always wins, and an
    # exhaustion with no hit is valid even when its own offset lies past
    # the window (all probes before it were marked and missed)
    srch_hit = g_srch & (first_hit != BIG)
    srch_done = g_srch & ~srch_hit & (first_ex != BIG)
    # extract the winning d16
    selrow = _bcast(first_hit >> 1, LCP) == iot
    selw = jnp.sum(jnp.where(selrow, candw, 0), axis=0, keepdims=True)
    hit_lo_half = (first_hit & 1) == 0
    hit_d = jnp.where(hit_lo_half, selw & 0xFFFF,
                      LK.shift_right_u(selw, 16))
    hit_pos = candb + first_hit
    gp = st["gp"] if depth > 1 else None
    dnx = st["dnx"] if depth > 1 else None
    gnx = st["gnx"] if depth > 1 else None
    mcd = st["mcd"] if mlen else None
    if mlen:
        selg_m = jnp.sum(jnp.where(selrow, gandw, 0), axis=0,
                         keepdims=True)
        hit_m = jnp.where(hit_lo_half, selg_m & 0xFFFF,
                          LK.shift_right_u(selg_m, 16))
        mcd = jnp.where(srch_hit, hit_m, mcd)
    if depth > 1:
        selg = jnp.sum(jnp.where(selrow, gandw, 0), axis=0, keepdims=True)
        hit_g = jnp.where(hit_lo_half, selg & 0xFFFF,
                          LK.shift_right_u(selg, 16))
        gp = jnp.where(srch_hit, hit_g, gp)
        # pos+1's record (the lazy-deferral candidate): row first_hit+1
        # is always in-window (probes stop at WPOS-2)
        nxt = first_hit + 1
        selrow_n = _bcast(nxt >> 1, LCP) == iot
        nxt_lo = (nxt & 1) == 0
        selw_n = jnp.sum(jnp.where(selrow_n, candw, 0), axis=0,
                         keepdims=True)
        selg_n = jnp.sum(jnp.where(selrow_n, gandw, 0), axis=0,
                         keepdims=True)
        dnx = jnp.where(srch_hit,
                        jnp.where(nxt_lo, selw_n & 0xFFFF,
                                  LK.shift_right_u(selw_n, 16)), dnx)
        gnx = jnp.where(srch_hit,
                        jnp.where(nxt_lo, selg_n & 0xFFFF,
                                  LK.shift_right_u(selg_n, 16)), gnx)
    gp2 = st["gp2"] if depth > 3 else None
    gnx2 = st["gnx2"] if depth > 3 else None
    if depth > 3:
        # 4th/5th chain gaps (g4|g5 tape) for pos and pos+1, same
        # rolled-row extraction as gp/gnx
        selg2 = jnp.sum(jnp.where(selrow, gandw2, 0), axis=0,
                        keepdims=True)
        hit_g2 = jnp.where(hit_lo_half, selg2 & 0xFFFF,
                           LK.shift_right_u(selg2, 16))
        gp2 = jnp.where(srch_hit, hit_g2, gp2)
        selg2_n = jnp.sum(jnp.where(selrow_n, gandw2, 0), axis=0,
                          keepdims=True)
        gnx2 = jnp.where(srch_hit,
                         jnp.where(nxt_lo, selg2_n & 0xFFFF,
                                   LK.shift_right_u(selg2_n, 16)), gnx2)
    # loop B: replay the schedule through probes at offsets <= stop
    stop = jnp.where(srch_hit, first_hit, jnp.int32(2 * WPOS))
    fp_b, st_b, sm_b = fpos, step, smn
    go = g_srch
    for _ in range(K1):
        ex_i = go & (fp_b + st_b > mflimit + 1)
        off = fp_b - candb
        adv = go & ~ex_i & (off >= 0) & (off < WPOS - 2) & (off <= stop)
        fp_b = jnp.where(adv, fp_b + st_b, fp_b)
        st_b = jnp.where(adv, LK.shift_right_u(sm_b, F.SKIPTRIGGER), st_b)
        sm_b = jnp.where(adv, sm_b + 1, sm_b)
        go = adv
    fpos = jnp.where(g_srch, fp_b, fpos)
    step = jnp.where(g_srch, st_b, step)
    smn = jnp.where(g_srch, sm_b, smn)
    pos = jnp.where(srch_hit, hit_pos, pos)
    mpos = jnp.where(srch_hit, hit_pos - hit_d, mpos)
    d = jnp.where(srch_hit, hit_d, d)

    # ---- VFY / PREP / EXT: verify + catch-up + forward extension ----
    ra0 = _r32(wa, 16)
    defer = jnp.zeros((1, LANES), bool)
    if depth > 1:
        # best-of-3 candidate selection (golden.compress_deep): forward
        # preview capped at 64 B from the verify windows, nearest wins
        # ties; then ONE-STEP LAZY: if pos+1's best-of-3 previews
        # strictly longer, the match accepts at pos+1 (its window set
        # wbb* was loaded by the wrapper from the dnx/gnx record)
        t20 = jnp.full((1, LANES), 20, jnp.int32)

        def pick(fa_p, ref32, cands, cap):
            # cap: the oracle previews min(matchlimit - (p+MINMATCH),
            # 64) — without it a far candidate matching past the
            # matchlimit outscores a nearer one tied at the cap, and
            # the nearest-wins tie-break inverts (observed as a single
            # offset divergence near block end at depth 5)
            best = jnp.full((1, LANES), -1, jnp.int32)
            dwin = jnp.zeros((1, LANES), jnp.int32)
            anyok = jnp.zeros((1, LANES), bool)
            for wbk, dk, have in cands:
                ok = have & (_r32(wbk, 16) == ref32)
                mc = jnp.where(ok, jnp.minimum(jnp.minimum(
                    _lead_eq(fa_p, funnel(wbk, t20, CAPW - 3)), 64),
                    cap), -1)
                use = mc > best
                best = jnp.maximum(best, mc)
                dwin = jnp.where(use, dk, dwin)
                anyok = anyok | ok
            return best, dwin, anyok

        fa_p = funnel(wa, t20, CAPW - 3)
        d2v = d + (gp & 255)
        d3v = d2v + LK.shift_right_u(gp, 8)
        candsA = [
            (wb, d, g_vfy),
            (wb2, d2v, g_vfy & ((gp & 255) != 0)),
            (wb3, d3v, g_vfy & (LK.shift_right_u(gp, 8) != 0))]
        if depth > 3:
            d4v = d3v + (gp2 & 255)
            d5v = d4v + LK.shift_right_u(gp2, 8)
            candsA += [
                (wb4, d4v, g_vfy & ((gp2 & 255) != 0)),
                (wb5, d5v, g_vfy & (LK.shift_right_u(gp2, 8) != 0))]
        bestA, dwinA, anyokA = pick(fa_p, ra0, candsA,
                                    matchlimit - (pos + F.MINMATCH))
        ra1 = _r32(wa, 17)
        fa_p1 = funnel(wa, t20 + 1, CAPW - 3)
        db2 = dnx + (gnx & 255)
        db3 = db2 + LK.shift_right_u(gnx, 8)
        lz = g_vfy & (pos + 1 <= mflimit)
        candsB = [
            (wbb1, dnx, lz & (dnx != 0)),
            (wbb2, db2, lz & (dnx != 0) & ((gnx & 255) != 0)),
            (wbb3, db3, lz & (dnx != 0)
             & (LK.shift_right_u(gnx, 8) != 0))]
        if depth > 3:
            db4 = db3 + (gnx2 & 255)
            db5 = db4 + LK.shift_right_u(gnx2, 8)
            candsB += [
                (wbb4, db4, lz & (dnx != 0) & ((gnx2 & 255) != 0)),
                (wbb5, db5, lz & (dnx != 0)
                 & (LK.shift_right_u(gnx2, 8) != 0))]
        bestB, dwinB, anyokB = pick(fa_p1, ra1, candsB,
                                    matchlimit - (pos + 1 + F.MINMATCH))
        defer = anyokA & anyokB & (bestB > bestA)
        anyok = anyokA
        dwin = jnp.where(defer, dwinB, dwinA)
        # the winner's source window, from the loaded set (candidate
        # distances are strictly increasing along a chain, so a dwin
        # equality uniquely identifies the winner)
        useA2 = ~defer & (dwinA == d2v) & ((gp & 255) != 0)
        useA3 = ~defer & (dwinA == d3v) & (LK.shift_right_u(gp, 8) != 0)
        useB2 = defer & (dwinB == db2) & ((gnx & 255) != 0)
        useB3 = defer & (dwinB == db3) & (LK.shift_right_u(gnx, 8) != 0)
        if depth > 3:
            useA4 = ~defer & (dwinA == d4v) & ((gp2 & 255) != 0)
            useA5 = ~defer & (dwinA == d5v) \
                & (LK.shift_right_u(gp2, 8) != 0)
            useB4 = defer & (dwinB == db4) & ((gnx2 & 255) != 0)
            useB5 = defer & (dwinB == db5) \
                & (LK.shift_right_u(gnx2, 8) != 0)
            useB1 = defer & ~useB2 & ~useB3 & ~useB4 & ~useB5
            wb = jnp.where(_bcast(useB5, CAPW), wbb5,
                 jnp.where(_bcast(useB4, CAPW), wbb4,
                 jnp.where(_bcast(useA5, CAPW), wb5,
                 jnp.where(_bcast(useA4, CAPW), wb4, wb))))
        else:
            useB1 = defer & ~useB2 & ~useB3
        wb = jnp.where(_bcast(useB3, CAPW), wbb3,
             jnp.where(_bcast(useB2, CAPW), wbb2,
             jnp.where(_bcast(useB1, CAPW), wbb1,
             jnp.where(_bcast(useA3, CAPW), wb3,
             jnp.where(_bcast(useA2, CAPW), wb2, wb)))))
        # a deferred lane behaves as if its verify windows were loaded
        # at (pos+1)-16: shift wa by one byte and advance pos, then the
        # whole downstream flow (verify, catch-up, extension, fused
        # emission) sees pos+1 semantics unchanged
        wa = LK.byteshift_up(wa, defer.astype(jnp.int32))
        ra0 = jnp.where(defer, ra1, ra0)
        pos = jnp.where(defer, pos + 1, pos)
        d = jnp.where(g_vfy & anyok, dwin, d)
        mpos = jnp.where(g_vfy & anyok, pos - dwin, mpos)
    rb0 = _r32(wb, 16)
    if mlen:
        # every surviving candidate is pass-1 verified (vr-zeroed d16),
        # and catch-up/length come from the mcode — no wb read here
        lcp_m = LK.shift_right_u(mcd, 1) & 15
        cu_m = LK.shift_right_u(mcd, 6) & 7
        vfy_ok = g_vfy
        vfy_fail = g_vfy & (mcd < 0)         # never (mcd is 9 bits)
    else:
        vfy_ok = g_vfy & (ra0 == rb0)
        vfy_fail = g_vfy & (ra0 != rb0)
    # hash16 false positive: the read32 check fails and the schedule
    # continues seamlessly (state already replayed past it)
    mode = jnp.where(vfy_fail, SRCH, mode)

    cu = vfy_ok | g_prep
    tc = _trail_eq16(wa, wb)
    if mlen:
        capd = jnp.where(g_vfy, cu_m, tc)
        full_cap = jnp.where(g_vfy, 4, 16)
    else:
        capd = tc
        full_cap = 16
    delta = jnp.where(cu, jnp.minimum(jnp.minimum(capd, pos - anchor),
                                      mpos - mlo), 0)
    pos = pos - delta
    mpos = mpos - delta
    cu_more = cu & (delta == full_cap) & (pos > anchor) & (mpos > mlo)

    ext_now = (cu & ~cu_more) | g_ext
    t_off = jnp.where(g_ext, 0, 20 - delta)
    fa = funnel(wa, t_off, CAPW - 3)
    fb = funnel(wb, t_off, CAPW - 3)
    le = jnp.minimum(_lead_eq(fa, fb), 4 * (CAPW - 3))
    span = jnp.where(g_ext, 4 * (CAPW - 3),
                     jnp.minimum(4 * (CAPW - 3),
                                 4 * CAPW - t_off - 3
                                 - defer.astype(jnp.int32)))
    if mlen:
        # exact equal-run from pos+MINMATCH = delta + lcp (the mcode's
        # capped forward length); span chosen so the downstream
        # le >= span test reads "maybe longer" exactly when lcp hit
        # its 8-byte cap
        le = jnp.where(g_vfy, delta + lcp_m, le)
        span = jnp.where(g_vfy,
                         delta + jnp.where(lcp_m == 8, 8, lcp_m + 1),
                         span)
    cl = matchlimit - (pos + F.MINMATCH)
    mc = jnp.where(ext_now & ~g_ext, 0, mc)
    add = jnp.minimum(jnp.minimum(le, span), cl - mc)
    mc = jnp.where(ext_now, mc + jnp.maximum(add, 0), mc)
    ext_more = ext_now & (le >= span) & (mc < cl)
    ext_done = ext_now & ~ext_more
    lit = jnp.where(vfy_ok | g_prep, pos - anchor, lit)
    d = jnp.where(vfy_ok | g_prep, pos - mpos, d)
    fused_ok = (lit < F.ML_MASK) & (mc < F.ML_MASK + 255)

    # ---- emission: fused into the completing verify round when the
    # literal run sits inside the verify window (o_a >= 1), else via the
    # EMIT fallback round (wa at anchor-4, o_a == 4) ----
    g_emit = (mode == EMIT) & wok
    k_tot = 1 + lit + 2 + (mc >= F.ML_MASK).astype(jnp.int32)
    o_a = jnp.where(g_emit, 4, 16 - delta - lit)
    femit = ext_done & ~g_ext & fused_ok & (o_a >= 1) & (head >= k_tot)
    if seg_lims is not None:
        # the headerless first sequence streams through LIT/TAIL (no
        # token byte): keep it off the fused/EMIT/HDR paths
        femit = femit & ~fragb
    emit_go = g_emit & (head >= k_tot)
    emit_stall = g_emit & (head < k_tot)     # wait for a flush
    emit_any = emit_go | femit
    token = (jnp.minimum(lit, F.RUN_MASK) << F.ML_BITS) \
        | jnp.minimum(mc, F.ML_MASK)
    lit_img = funnel(wa, jnp.maximum(o_a - 1, 0), CAPW) \
        & byte_mask(CAPW, jnp.ones((1, LANES), jnp.int32), 1 + lit)
    tw = d | LK.shift_left_u(jnp.maximum(mc - F.ML_MASK, 0), 16)
    ntail = 2 + (mc >= F.ML_MASK).astype(jnp.int32)
    tail_img = _at_byte(tw, 1 + lit, ntail, CAPW)
    tok_img = _at_byte(token, jnp.zeros((1, LANES), jnp.int32),
                       jnp.ones((1, LANES), jnp.int32), CAPW)
    emit_stream = tok_img | lit_img | tail_img

    # ---- streamed header phases (HDR / TAIL / FHDR) ----
    g_hdr = mode == HDR
    g_tail = mode == TAIL
    g_fhdr = mode == FHDR
    g_h = g_hdr | g_tail | g_fhdr
    last = n - anchor
    npb = jnp.where(g_tail, 2, 1)
    ftok = jnp.minimum(last, F.RUN_MASK) << F.ML_BITS
    pw = jnp.where(g_hdr, token, jnp.where(g_tail, d, ftok))
    q = jnp.where(g_hdr, lit, jnp.where(g_tail, mc, last)) - F.ML_MASK
    lsic_on = q >= 0
    nff = jnp.maximum(q, 0) // 255
    total = npb + jnp.where(lsic_on, nff + 1, 0)
    k_h = jnp.clip(jnp.minimum(jnp.minimum(total - hk, jnp.int32(CAP)),
                               head), 0)
    ff_img = byte_mask(CAPW, npb - hk, npb + nff - hk)
    p_img = _at_byte(LK.shift_right_u(pw, jnp.minimum(hk, 4) * 8),
                     jnp.zeros((1, LANES), jnp.int32),
                     jnp.clip(npb - hk, 0, 2), CAPW)
    rpos = npb + nff - hk
    rby = (jnp.maximum(q, 0) - 255 * nff) * jnp.int32(0x01010101)
    r_img = jnp.where(_bcast(lsic_on & (rpos >= 0) & (rpos < CAP), CAPW),
                      rby & byte_mask(CAPW, rpos, rpos + 1), 0)
    hdr_stream = ff_img | p_img | r_img

    # ---- literal copy phases (LIT / FLIT): wa = src[anchor+ldone ..] ----
    g_lit = (mode == LIT) & wok
    g_flit = (mode == FLIT) & wok
    g_l = g_lit | g_flit
    l_total = jnp.where(g_flit, last, lit)
    k_l = jnp.clip(jnp.minimum(jnp.minimum(l_total - ldone,
                                           jnp.int32(CAP)), head), 0)
    k_l = jnp.where(g_l, k_l, 0)

    # ---- the round's single staging write ----
    stream = jnp.where(_bcast(g_h, CAPW), hdr_stream,
                       jnp.where(_bcast(emit_any, CAPW), emit_stream,
                                 wa))
    k = jnp.where(emit_any, k_tot,
                  jnp.where(g_h, k_h, k_l))
    stag = place_ring(stag, stream, opos & (rspan - 1), k)
    opos = opos + k
    hk_new = jnp.where(g_h, hk + k, hk)
    ldone = jnp.where(g_l, ldone + k, ldone)

    # ---- transitions ----
    seq_end = emit_any | (g_tail & (hk_new >= total))
    pos_n = jnp.where(seq_end, pos + F.MINMATCH + mc, pos)
    anchor = jnp.where(seq_end, pos_n, anchor)
    past = seq_end & (pos_n > mflimit)
    # merged rematch: a fresh schedule starts AT the new anchor
    fpos = jnp.where(seq_end & ~past, pos_n, fpos)
    step = jnp.where(seq_end & ~past, 1, step)
    smn = jnp.where(seq_end & ~past, accel << F.SKIPTRIGGER, smn)

    if seg_lims is None:
        after_ext = jnp.where(fused_ok, EMIT, HDR)
    else:
        after_ext = jnp.where(fragb, LIT, jnp.where(fused_ok, EMIT, HDR))
    mode = jnp.where(emit_stall, EMIT,
           jnp.where(cu_more, PREP,
           jnp.where(ext_more, EXT,
           jnp.where(seq_end, jnp.where(past, end_mode, SRCH),
           jnp.where(ext_done, after_ext,
           jnp.where(g_hdr & (hk_new >= total), LIT,
           jnp.where(g_lit & (ldone >= lit), TAIL,
           jnp.where(g_fhdr & (hk_new >= total), FLIT,
           jnp.where(g_flit & (ldone >= last), DONE,
           jnp.where(srch_hit, VFY,
           jnp.where(srch_done, end_mode,
                     mode)))))))))))
    pos = pos_n
    # entering detection must compare against the RAW previous mode:
    # g_lit/g_flit are wok-gated, so "& ~g_flit" would read a parked
    # sub-round's FLIT lane as ENTERING and zero its progress every round
    mode0 = st["mode"]
    entering_h = ((mode == HDR) & (mode0 != HDR)) \
        | ((mode == TAIL) & (mode0 != TAIL)) \
        | ((mode == FHDR) & (mode0 != FHDR))
    hk = jnp.where(entering_h, 0, hk_new)
    entering_l = ((mode == LIT) & (mode0 != LIT)) \
        | ((mode == FLIT) & (mode0 != FLIT))
    ldone = jnp.where(entering_l, 0, ldone)
    # the terminal literal-only sequence starts where opos stood when the
    # lane entered FHDR (its token is emitted in a later round) — the
    # segment-splice path (golden.splice_segments) consumes this
    tpos = jnp.where((mode == FHDR) & (mode0 != FHDR), opos, st["tpos"])

    st2 = dict(mode=mode, pos=pos, fpos=fpos, step=step, smn=smn,
               anchor=anchor, mpos=mpos, mc=mc, lit=lit, d=d, opos=opos,
               hk=hk, ldone=ldone, tpos=tpos,
               nseq=st["nseq"] + seq_end.astype(jnp.int32),
               rounds=st["rounds"] + 1)
    if seg_lims is not None:
        # first-sequence record for the host assembly: p1 = match start
        # (post catch-up, pre-advance), m1 = its match code
        rec = seq_end & fragb
        st2["p1"] = jnp.where(rec, pos_n - F.MINMATCH - mc, st["p1"])
        st2["m1"] = jnp.where(rec, mc, st["m1"])
        st2["frag"] = jnp.where(seq_end, 0, st["frag"])
        st2["hasm"] = st["hasm"] | seq_end.astype(jnp.int32)
    if mlen:
        st2["mcd"] = mcd
    if depth > 1:
        st2["gp"] = gp
        st2["dnx"] = dnx
        st2["gnx"] = gnx
    if depth > 3:
        st2["gp2"] = gp2
        st2["gnx2"] = gnx2
    return st2, stag


def _parse_kernel(src_ref, cand_ref, gaps_ref, gaps2_ref, n_ref, out_ref,
                  len_ref, err_ref, tl_ref, ns_ref, *rest,
                  SW: int, CPR: int, OR: int, accel: int, unroll: int = 2,
                  wb_band: int = 64, depth: int = 1, seg_w: int = 0,
                  far_every: int = 0, near_lim: int = 4096,
                  mlen: bool = False,
                  debug_rounds: bool = False, debug_modes: bool = False):
    if seg_w:
        p1_ref, m1_ref = rest[0], rest[1]
        rest = rest[2:]
    (candw_ref, candb_ref, wa_ref, wb_ref, gandw_ref, wb2_ref, wb3_ref,
     wbb1_ref, wbb2_ref, wbb3_ref, gandw2_ref, wb4_ref, wb5_ref,
     wbb4_ref, wbb5_ref, fl_ref) = rest
    g = 0
    blog = BAND.bit_length() - 1
    wblog = wb_band.bit_length() - 1
    fhlog = FH.bit_length() - 1
    rspan = SRO * 4

    if seg_w:
        # per-lane limit rows (host-computed, LOCAL tape coordinates):
        # 0=seg end, 1=search limit, 2=match limit, 3=start pos,
        # 4=catch-up floor, 5=block-first flag
        lims = n_ref[0]
        n = lims[0:1]
        z = n * 0
        mfl_v, mlim_v = lims[1:2], lims[2:3]
        pos0, mlo_v, bf = lims[3:4], lims[4:5], lims[5:6]
        seg_lims = (mfl_v, mlim_v, mlo_v)
        st = dict(mode=jnp.where(pos0 <= mfl_v, SRCH, DONE)
                  .astype(jnp.int32),
                  pos=pos0, fpos=pos0, step=z + 1,
                  smn=z + (accel << F.SKIPTRIGGER),
                  anchor=z + seg_w, mpos=z, mc=z, lit=z, d=z, opos=z,
                  hk=z, ldone=z, tpos=z, nseq=z, rounds=z,
                  p1=z, m1=z, hasm=z, frag=(bf == 0).astype(jnp.int32))
    else:
        n = n_ref[0]
        z = n * 0
        seg_lims = None
        searchable = n >= F.MIN_LENGTH
        st = dict(mode=jnp.where(searchable, SRCH, FHDR).astype(jnp.int32),
                  pos=z + 1, fpos=z + 1, step=z + 1,
                  smn=z + (accel << F.SKIPTRIGGER),
                  anchor=z, mpos=z, mc=z, lit=z, d=z, opos=z,
                  hk=z, ldone=z, tpos=z, nseq=z, rounds=z)
    if mlen:
        st["mcd"] = z
    if depth > 1:
        st["gp"] = z
        st["dnx"] = z
        st["gnx"] = z
    if depth > 3:
        st["gp2"] = z
        st["gnx2"] = z
    if debug_modes:
        st["dbg"] = _bcast(z, 16)
    fl_ref[...] = z
    candb_ref[...] = z - 4 * WPOS            # poisoned: first refill fires
    max_rounds = jnp.int32(4 * CPR + 4096)
    margin = unroll * CAP + 8            # max opos advance between flushes

    def cond(c):
        st, _stag = c
        return jnp.any(st["mode"] != DONE) & jnp.all(
            st["rounds"] < max_rounds)

    def body(c):
        st, stag = c
        fl = fl_ref[...]
        mode = st["mode"]
        live = mode != DONE
        g_srch = mode == SRCH
        g_ab = (mode == VFY) | (mode == PREP) | (mode == EXT)
        g_l = (mode == LIT) | (mode == FLIT)
        g_a = g_ab | (mode == EMIT) | g_l
        candb = candb_ref[...]

        # ---- batched round-start decisions ----
        # r_need covers VFY/EXT/EMIT lanes too: their fused emission ends
        # the sequence mid-round and the same round's later sub-step
        # searches from the new anchor — a window based only on SRCH
        # lanes would stall that search every time (measured: the u=2
        # alternation never engaged, 2 wrapper rounds per sequence)
        g_pre = g_srch | g_ab | (mode == EMIT)
        g_wb = ((mode == PREP) | (mode == EXT)) if mlen else g_ab
        if far_every > 1:
            # far-offset lanes are served every far_every-th round: the
            # match-side walk's span is the union across lanes, so ONE
            # far lane otherwise drags a near-full-window scan into
            # every round (offsets are heavy-tailed)
            served = (st["d"] <= near_lim) \
                | ((st["rounds"] % far_every) == 0)
            g_abs = g_wb & served
        else:
            served = None
            g_abs = g_wb
        r_need = g_pre & ((st["fpos"] < candb)
                          | (st["fpos"] - candb >= WPOS - 3 * K1))
        f_need = live & (st["opos"] + margin > fl * 4 + rspan)
        packed1 = jnp.sum(r_need.astype(jnp.int32)
                          + (g_a.astype(jnp.int32) << 8)
                          + (g_abs.astype(jnp.int32) << 16))
        packed2 = jnp.sum(f_need.astype(jnp.int32))
        # cand window rebase: every LIVE lane keeps its own schedule
        # position (fpos tracks the next search start across sequences);
        # finished lanes clamp into the live span
        cb_lo = jnp.min(jnp.where(live, st["fpos"], BIG)) & ~1
        cb_new = jnp.where(live, st["fpos"], cb_lo) & ~1
        crb = (cb_new - seg_w) >> 1              # packed cand row base
        c_lo = jnp.min(crb) >> blog
        c_hi = jnp.max(crb) >> blog
        # wa / wb addresses (idle lanes clamp to the live minimum)
        wa_addr = jnp.where(mode == EXT, st["pos"] + F.MINMATCH + st["mc"],
                   jnp.where(mode == EMIT, st["anchor"] - 4,
                    jnp.where(g_l, st["anchor"] + st["ldone"],
                              st["pos"] - 16)))
        wa_lo = jnp.min(jnp.where(g_a, wa_addr, BIG))
        wa_c = jnp.where(g_a, wa_addr, wa_lo)
        a_lo = jnp.min(wa_c) >> (2 + blog)
        a_hi = jnp.max(wa_c) >> (2 + blog)
        wb_addr = jnp.where(mode == EXT, st["mpos"] + F.MINMATCH + st["mc"],
                            st["mpos"] - 16)
        wb_lo = jnp.min(jnp.where(g_abs, wb_addr, BIG))
        wb_c = jnp.where(g_abs, wb_addr, wb_lo)
        b_lo = jnp.min(wb_c) >> (2 + wblog)
        b_hi = jnp.max(wb_c) >> (2 + wblog)
        # flush rows
        opr = st["opos"] >> 2
        nfl = jnp.maximum(((opr - fl) >> fhlog) << fhlog, 0)
        wf_lo = jnp.min(jnp.where(nfl > 0, fl, BIG)) >> blog
        wf_hi = (jnp.max(jnp.where(nfl > 0, fl + nfl, 0)) + BAND - 1) \
            >> blog

        @pl.when((packed1 & 255) != 0)
        def _refill_cand():
            candw_ref[...] = extract_rows_banded(
                cand_ref, g, crb, LCP, CPR, bounds=(c_lo, c_hi))
            candb_ref[...] = cb_new
            if depth > 1 or mlen:
                gandw_ref[...] = extract_rows_banded(
                    gaps_ref, g, crb, LCP, CPR, bounds=(c_lo, c_hi))
            if depth > 3:
                gandw2_ref[...] = extract_rows_banded(
                    gaps2_ref, g, crb, LCP, CPR, bounds=(c_lo, c_hi))

        @pl.when(((packed1 >> 8) & 255) != 0)
        def _load_wa():
            wa_ref[...] = extract_bytes_banded(
                src_ref, g, wa_c, CAPW, SW, bounds=(a_lo, a_hi))

        @pl.when(((packed1 >> 16) & 255) != 0)
        def _load_wb():
            # the match-side window has the widest spans (offsets are
            # heavy-tailed to 64 KiB); its slab width is tunable
            wb_ref[...] = extract_bytes_banded(
                src_ref, g, wb_c, CAPW, SW, bounds=(b_lo, b_hi),
                band=wb_band)
            if depth > 1:
                # 2nd/3rd chain candidates plus the pos+1 lazy set
                # (deep mode): same span class
                gp = st["gp"]
                d2 = st["d"] + (gp & 255)
                d3 = d2 + LK.shift_right_u(gp, 8)
                dnx, gnx = st["dnx"], st["gnx"]
                db2 = dnx + (gnx & 255)
                db3 = db2 + LK.shift_right_u(gnx, 8)
                addr = [st["pos"] - d2 - 16, st["pos"] - d3 - 16,
                        st["pos"] + 1 - dnx - 16, st["pos"] + 1 - db2 - 16,
                        st["pos"] + 1 - db3 - 16]
                refs = [wb2_ref, wb3_ref, wbb1_ref, wbb2_ref, wbb3_ref]
                if depth > 3:
                    gp2 = st["gp2"]
                    d4 = d3 + (gp2 & 255)
                    d5 = d4 + LK.shift_right_u(gp2, 8)
                    gnx2 = st["gnx2"]
                    db4 = db3 + (gnx2 & 255)
                    db5 = db4 + LK.shift_right_u(gnx2, 8)
                    addr += [st["pos"] - d4 - 16, st["pos"] - d5 - 16,
                             st["pos"] + 1 - db4 - 16,
                             st["pos"] + 1 - db5 - 16]
                    refs += [wb4_ref, wb5_ref, wbb4_ref, wbb5_ref]
                for wk_addr, wk_ref in zip(addr, refs):
                    wkc = jnp.where(g_abs, wk_addr, wb_lo)
                    # independent walk bounds: these windows' addresses
                    # are NOT contained in the primary wb span
                    wk_ref[...] = extract_bytes_banded(
                        src_ref, g, wkc, CAPW, SW,
                        bounds=(jnp.min(wkc) >> (2 + wblog),
                                jnp.max(wkc) >> (2 + wblog)),
                        band=wb_band)

        @pl.when((packed2 & 255) != 0)
        def _do_flush():
            flush_ring(stag, out_ref, g, fl, nfl, OR,
                       bounds=(wf_lo, wf_hi))
            fl_ref[...] = fl + nfl

        fl2 = fl_ref[...]
        if debug_modes:
            # rows 11-14: slab VISITS per walk class (span diagnostics),
            # row 15: flush fires
            rows16 = _iota_rows(16)
            inc = jnp.zeros((16, LANES), jnp.int32)
            for ridx, fired, visits in (
                    (11, (packed1 & 255) != 0, c_hi - c_lo + 3),
                    (12, ((packed1 >> 8) & 255) != 0, a_hi - a_lo + 2),
                    (13, ((packed1 >> 16) & 255) != 0, b_hi - b_lo + 2),
                    (15, (packed2 & 255) != 0, jnp.int32(1))):
                inc = inc + jnp.where(
                    rows16 == ridx,
                    jnp.where(fired, visits, 0).astype(jnp.int32), 0)
        dbg = st.get("dbg")
        st2 = st
        for u in range(unroll):
            if debug_modes:
                inc = inc + (rows16 == _bcast(st2["mode"], 16)) \
                    .astype(jnp.int32)
            st2, stag = _parse_round(
                st2, stag, fl2, wa_ref[...], wb_ref[...],
                candw_ref[...], candb_ref[...], n, accel,
                wok=(u == 0), depth=depth, mlen=mlen,
                gandw=gandw_ref[...] if (depth > 1 or mlen) else None,
                wb2=wb2_ref[...] if depth > 1 else None,
                wb3=wb3_ref[...] if depth > 1 else None,
                wbb1=wbb1_ref[...] if depth > 1 else None,
                wbb2=wbb2_ref[...] if depth > 1 else None,
                wbb3=wbb3_ref[...] if depth > 1 else None,
                gandw2=gandw2_ref[...] if depth > 3 else None,
                wb4=wb4_ref[...] if depth > 3 else None,
                wb5=wb5_ref[...] if depth > 3 else None,
                wbb4=wbb4_ref[...] if depth > 3 else None,
                wbb5=wbb5_ref[...] if depth > 3 else None,
                seg_lims=seg_lims, lane_ok=served)
        if debug_modes:
            st2["dbg"] = dbg + inc
        return st2, stag

    st, stag = jax.lax.while_loop(cond, body, (st, _bcast(z, SRO)))

    fl = fl_ref[...]
    flush_ring(stag, out_ref, g, fl, jnp.int32(OR) - fl, OR,
               byte_lim=st["opos"])
    if debug_modes:
        out_ref[g, 0:16, :] = st["dbg"]
    err = (st["mode"] != DONE).astype(jnp.int32)
    len_ref[0] = jnp.where(err != 0, 0, st["opos"])
    err_ref[0] = st["rounds"] if debug_rounds else err
    ns_ref[0] = st["nseq"]                       # decode-cost hint
    if seg_w:
        tl_ref[0] = st["anchor"]                 # last_end (local)
        p1_ref[0] = st["p1"]
        m1_ref[0] = st["m1"] | LK.shift_left_u(st["hasm"], 16)
    else:
        tl_ref[0] = st["tpos"]


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _pack_cand(c, chunk: int = 4096):
    """(ng, NP, 128) one-d16-per-row cand tape -> (ng, NP/2, 128) with
    two positions packed per row (positions 2j | 2j+1 << 16). Chunked +
    barriered for the same scoped-fusion reason as _permute_blocks."""
    ng, rows, _ = c.shape
    parts = []
    for r0 in range(0, rows, chunk):
        sl = c[:, r0:r0 + chunk, :]
        parts.append((sl[:, 0::2, :] & 0xFFFF)
                     | LK.shift_left_u(sl[:, 1::2, :] & 0xFFFF, 16))
    return jax.lax.optimization_barrier(jnp.concatenate(parts, axis=1))


def _permute_blocks(x, order, chunk: int = 2048):
    """Permute a lane-major (ng, R, 128) tape set by block index
    (block b = group b//128, lane b%128), in row chunks: one fused
    transpose+gather over the whole array exceeds XLA's 16 MB scoped
    fusion limit (measured 16.4-48.4 MB)."""
    ng, rows, _ = x.shape
    parts = []
    for r0 in range(0, rows, chunk):
        w = min(chunk, rows - r0)
        sl = x[:, r0:r0 + w, :]
        parts.append(
            sl.transpose(0, 2, 1).reshape(ng * LANES, w)[order]
            .reshape(ng, LANES, w).transpose(0, 2, 1))
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("block_size", "accel", "interpret",
                                    "group_sort", "unroll", "debug_rounds",
                                    "debug_modes", "cand_only",
                                    "mlen_cand", "mlen",
                                    "return_tails", "return_nseq",
                                    "wb_band", "depth"))
def compress_blocks_lockstep_enc3(raw, raw_len, block_size: int,
                                  accel: int = 1,
                                  interpret: bool = False,
                                  group_sort: bool = True,
                                  unroll: int = 2,
                                  debug_rounds: bool = False,
                                  debug_modes: bool = False,
                                  cand_only: bool = False,
                                  mlen_cand: bool = False,
                                  mlen: bool = False,
                                  return_tails: bool = False,
                                  return_nseq: bool = False,
                                  wb_band: int = 64,
                                  depth: int = 1):
    """Compress a batch of independent LZ4 blocks (v3 sort engine).

    raw uint8 [B, block_size] zero-padded, raw_len int32 [B] ->
    (comp uint8 [B, compress_bound(block_size)], comp_len int32 [B],
    err bool [B]). Output bytes are exactly golden.compress_dense
    (hashlog=16, accel semantics included); err is nonzero only if the
    machine failed to converge, which on any input is a bug, not a data
    condition (the rounds cap is a backstop).

    group_sort: re-group blocks between the candidate and parse passes
    by candidate density so same-cost blocks share lockstep groups.
    cand_only: return the raw cand tapes (pass-1 timing/parity probes).
    """
    if block_size > 65536:
        raise ValueError("enc3 kernel path caps at 64 KiB blocks "
                         "(pos16 sort keys); larger blocks frame-split")
    raw = jnp.asarray(raw, jnp.uint8)
    raw_len = jnp.asarray(raw_len, jnp.int32)
    nb, slot = raw.shape
    assert slot >= block_size
    np_ = 1 << max(block_size - 1, 1).bit_length()
    ng = -(-nb // LANES)
    pad = ng * LANES - nb
    if pad:
        raw = jnp.pad(raw, ((0, pad), (0, 0)))
        raw_len = jnp.pad(raw_len, (0, pad))
    g8 = raw.reshape(ng, LANES, slot)
    gl = raw_len.reshape(ng, LANES)
    # pack per group: a vmapped pack fuses all groups into one XLA fusion
    # whose scoped VMEM exceeds the 16 MB fusion limit at ng > 1
    tapes = jnp.stack([LK.pack_tapes(g8[g], gl[g]) for g in range(ng)])
    sw = max(tapes.shape[1] + 8, np_ // 4 + 8)
    sw = -(-sw // BAND) * BAND                         # banded-scan slabs
    tapes = jnp.pad(tapes, ((0, 0), (0, sw - tapes.shape[1]), (0, 0)))
    nlane = gl.reshape(ng, 1, LANES)

    # ---- pass 1: candidates ----
    if mlen_cand:
        # round-6 groundwork probe: verified candidates + exact capped
        # mlen/catch-up codes via the payload-carrying sort
        # (golden.dense_mcode contract). VMEM payload tapes serve
        # NP <= 16384; larger blocks (the production 64 KiB shape) run
        # the HBM-chunked variant (_sort_ref_hbm).
        assert cand_only, "mlen_cand: probe-only"
        cand, mcode, dens = _cand_call(
            tapes, nlane, np_, interpret,
            mlen_mode=np_ <= 16384, mlen_hbm=np_ > 16384)
        return cand, mcode, dens
    gaps2 = None
    if mlen:
        assert depth == 1, "mlen is a greedy-path mode"
        cand, gaps, dens = _cand_call(
            tapes, nlane, np_, interpret,
            mlen_mode=np_ <= 16384, mlen_hbm=np_ > 16384)
    elif depth > 1:
        cand, gaps, dens = _cand_call(tapes, nlane, np_, interpret,
                                      depth=depth)
        if depth > 3:
            gaps2, _ = _cand_call(tapes, nlane, np_, interpret,
                                  gaps2_only=True)
    else:
        cand, dens = _cand_call(tapes, nlane, np_, interpret)
        gaps = None
    if cand_only:
        return cand, dens
    # pack two positions per row: the cand refill walk is the largest
    # VMEM scan of the parse (measured 223 slab visits per round at one
    # row per position) — halving its rows halves those bytes
    cand = _pack_cand(cand)
    cpr = np_ // 2
    gaps = _pack_cand(gaps) if (depth > 1 or mlen) else \
        jnp.zeros((ng, 8, LANES), jnp.int32)
    gaps2 = _pack_cand(gaps2) if depth > 3 else \
        jnp.zeros((ng, 8, LANES), jnp.int32)

    # ---- regroup by density (slowest blocks share groups) ----
    if group_sort and ng > 1:
        dens_b = dens.transpose(0, 2, 1).reshape(ng * LANES)
        order = jnp.argsort(-dens_b)
        inv = jnp.argsort(order)
        tapes = _permute_blocks(tapes, order)
        cand = _permute_blocks(cand, order)
        if depth > 1 or mlen:
            gaps = _permute_blocks(gaps, order)
        if depth > 3:
            gaps2 = _permute_blocks(gaps2, order)
        gl_s = gl.reshape(-1)[order].reshape(ng, LANES)
        nlane = gl_s.reshape(ng, 1, LANES)

    bound = F.compress_bound(block_size)
    out_cap = -(-bound // (4 * BAND)) * (4 * BAND)
    orr = out_cap // 4

    # materialize every parse input: mixed producer fusions (pack/pad/
    # dens concat + per-group slices) repeatedly tip over the 16 MB
    # scoped-fusion limit at high group counts
    tapes, cand, gaps, gaps2, nlane = jax.lax.optimization_barrier(
        (tapes, cand, gaps, gaps2, nlane))
    gpr = gaps.shape[1]
    gpr2 = gaps2.shape[1]
    grid_ng = ng if _grid_fits(sw, cpr, gpr, gpr2, orr) else 1
    parse_call = pl.pallas_call(
        functools.partial(_parse_kernel, SW=sw, CPR=cpr, OR=orr,
                          accel=accel, unroll=unroll, wb_band=wb_band,
                          depth=depth, mlen=mlen,
                          debug_rounds=debug_rounds,
                          debug_modes=debug_modes),
        grid=(grid_ng,),
        in_specs=[
            pl.BlockSpec((1, sw, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, cpr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, gpr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, gpr2, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid_ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid_ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid_ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid_ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid_ng, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LCP, LANES), jnp.int32),       # cand window
            pltpu.VMEM((1, LANES), jnp.int32),         # cand window base
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wa operand
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb operand
            pltpu.VMEM((LCP, LANES), jnp.int32),       # gaps window
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb2 (deep)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb3 (deep)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb1 (lazy)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb2 (lazy)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb3 (lazy)
            pltpu.VMEM((LCP, LANES), jnp.int32),       # gaps2 window
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb4 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb5 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb4 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb5 (depth 5)
            pltpu.VMEM((1, LANES), jnp.int32),         # flush frontier
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    if grid_ng == ng:
        out, out_len, err, tails, nseq = parse_call(tapes, cand, gaps,
                                                    gaps2, nlane)
    else:
        # one invocation per group: a multi-group grid double-buffers the
        # 32 MB cand input window and blows VMEM
        parts = [parse_call(tapes[g:g + 1], cand[g:g + 1], gaps[g:g + 1],
                            gaps2[g:g + 1], nlane[g:g + 1])
                 for g in range(ng)]
        out = jax.lax.optimization_barrier(
            jnp.concatenate([p[0] for p in parts], axis=0))
        out_len = jnp.concatenate([p[1] for p in parts], axis=0)
        err = jnp.concatenate([p[2] for p in parts], axis=0)
        tails = jnp.concatenate([p[3] for p in parts], axis=0)
        nseq = jnp.concatenate([p[4] for p in parts], axis=0)

    data = jnp.concatenate(
        [LK.unpack_tapes(out[g]) for g in range(ng)], axis=0)
    out_len = out_len.reshape(-1)
    err = err.reshape(-1)
    tails = tails.reshape(-1)
    nseq = nseq.reshape(-1)
    if group_sort and ng > 1:
        data = jax.lax.optimization_barrier(data)[inv]
        out_len = out_len[inv]
        err = err[inv]
        tails = tails[inv]
        nseq = nseq[inv]
    if debug_rounds or debug_modes:
        return data[:nb, :bound], out_len[:nb], err[:nb]
    if return_tails:
        return (data[:nb, :bound], out_len[:nb], err[:nb].astype(bool),
                tails[:nb])
    if return_nseq:
        return (data[:nb, :bound], out_len[:nb], err[:nb].astype(bool),
                nseq[:nb])
    return data[:nb, :bound], out_len[:nb], err[:nb].astype(bool)


# ---------------------------------------------------------------------------
# Segmented-lane mode: one 64 KiB-class block spread across nseg lanes
# ---------------------------------------------------------------------------


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _piecewise_cand(rawm, raw_len, block_size: int, depth: int,
                    interpret: bool):
    """Pass 1 for blocks beyond the pos16 sort range (> 64 KiB).

    Runs the bitonic cand kernel per 64 KiB PIECE and once more over
    half-piece-shifted STRADDLE stretches, then merges (most recent
    candidate wins, ties to the piece pass) — byte contract
    golden.dense_candidates_piecewise. Returns block-major payload
    arrays (nb1, block_size) int32: d16 (and gaps when depth > 1).

    rawm (nb1, block_size) u8, zero past raw_len.
    """
    PIECE = 65536
    SUF = 32          # v32 lookahead into the next piece (last 3 pos)
    nb1 = rawm.shape[0]
    P = block_size // PIECE

    def run_pass(bases):
        nbase = len(bases)
        rawp = jnp.pad(rawm, ((0, 0), (0, SUF)))
        segs = jnp.stack([rawp[:, b:b + PIECE + SUF] for b in bases],
                         axis=1).reshape(nb1 * nbase, PIECE + SUF)
        bl = jnp.asarray(bases, jnp.int32)
        # valid candidate positions reach PIECE-1 when input continues
        # past the piece (their v32 reads the suffix)
        ln = jnp.clip(raw_len[:, None] - bl[None, :], 0,
                      PIECE + 3).reshape(-1)
        npr = nb1 * nbase
        ngp = -(-npr // LANES)
        pad = ngp * LANES - npr
        if pad:
            segs = jnp.pad(segs, ((0, pad), (0, 0)))
            ln = jnp.pad(ln, (0, pad))
        g8 = segs.reshape(ngp, LANES, PIECE + SUF)
        gl = ln.reshape(ngp, LANES)
        tapes = jnp.stack([LK.pack_tapes(g8[g], gl[g])
                           for g in range(ngp)])
        sw = _roundup(max(tapes.shape[1] + 8, PIECE // 4 + 8), BAND)
        tapes = jnp.pad(tapes, ((0, 0), (0, sw - tapes.shape[1]), (0, 0)))
        nl = gl.reshape(ngp, 1, LANES)
        if depth > 1:
            cand, gaps, _ = _cand_call(tapes, nl, PIECE, interpret,
                                       depth=depth)
        else:
            cand, _ = _cand_call(tapes, nl, PIECE, interpret)
            gaps = None

        def flat(t):
            outs = [jax.lax.optimization_barrier((t[g] & 0xFFFF).T)
                    for g in range(t.shape[0])]
            return jnp.concatenate(outs, axis=0)[:npr]

        return flat(cand), (flat(gaps) if depth > 1 else None)

    ic, ig = run_pass([k * PIECE for k in range(P)])
    intra = ic.reshape(nb1, block_size)
    intra_g = ig.reshape(nb1, block_size) if depth > 1 else None
    if P < 2:
        return intra, intra_g
    sc, sg = run_pass([PIECE // 2 + k * PIECE for k in range(P - 1)])
    lo, hi = PIECE // 2, PIECE // 2 + (P - 1) * PIECE
    sfull = jnp.zeros((nb1, block_size), jnp.int32).at[:, lo:hi].set(
        sc.reshape(nb1, hi - lo))
    take_s = (sfull != 0) & ((intra == 0) | (sfull < intra))
    merged = jnp.where(take_s, sfull, intra)
    if depth > 1:
        sgf = jnp.zeros((nb1, block_size), jnp.int32).at[:, lo:hi].set(
            sg.reshape(nb1, hi - lo))
        merged_g = jnp.where(take_s, sgf, intra_g)
    else:
        merged_g = None
    return merged, merged_g


@functools.partial(jax.jit,
                   static_argnames=("block_size", "seg", "window", "accel",
                                    "interpret", "unroll", "wb_band",
                                    "depth", "debug_rounds", "stage",
                                    "far_every", "near_lim",
                                    "return_nseq", "debug_modes",
                                    "group_sort", "seg_nseq", "mlen"))
def compress_blocks_lockstep_seg(raw, raw_len, block_size: int,
                                 seg: int = 4096, window: int = 65536,
                                 accel: int = 1, interpret: bool = False,
                                 unroll: int = 2, wb_band: int = 64,
                                 depth: int = 1, mlen: bool = False,
                                 debug_rounds: bool = False,
                                 debug_modes: bool = False,
                                 stage: str = "all",
                                 far_every: int = 0,
                                 near_lim: int = 4096,
                                 group_sort: bool = True,
                                 group_key=None,
                                 return_nseq: bool = False,
                                 seg_nseq: bool = False):
    """Segment-parallel block compress (the enc3 seg engine).

    group_key: optional int32 [nb*nseg] per-segment parse-cost keys
    (block-major, segment-minor) overriding the candidate-density
    grouping — the probe channel for cost-hint experiments (the decode
    engines' nseq lesson, docs/Performance.md round-4).

    Each block is cut into `seg`-byte segments parsed by SEPARATE lanes
    against per-lane windowed tape columns (src[k*seg - window ..
    k*seg + seg)), so every lane's walk addresses stay inside one
    segment span instead of diverging across a whole 64 KiB block — the
    regime where the banded walks collapse (docs/Performance.md: the
    4 KiB bdev config measures ~7x the 64 KiB rate on the same engine).
    Matches still reach backward through the full `window` across
    segment boundaries via the global pass-1 candidates.

    Byte contract: golden.compress_dense_seg(seg, window, hashlog=16,
    depth) per block. Per-segment streams, run headers and raw literal
    tails are concatenated device-side with forward dynamic_update_slice
    writes (each write's slack is clobbered by the next piece), so no
    host byte-patching exists anywhere on this path.

    Output blocks that exceed COMPRESSBOUND (possible for adversarial
    barely-compressible data: each run header is an extra token + LSIC
    vs the single-stream parse) return comp_len 0 — the reference's
    limited-output failure (lz4e_compress.c:358-363); the framing
    layer's verify/fallback re-encodes those on the host.
    """
    if block_size % seg or LANES % (block_size // seg):
        raise ValueError("seg must divide block_size into a power-of-two "
                         "segment count <= 128")
    if seg % 128:
        raise ValueError("seg must be a multiple of 128")
    if block_size > 65536 and block_size % 65536:
        raise ValueError("blocks > 64 KiB must be multiples of 64 KiB "
                         "(piecewise pass-1 stretches)")
    # the seg engine caps at depth 3: its piecewise pass-1 carries no
    # second gaps tape (golden.compress_dense_seg contract)
    depth = min(depth, 3)
    nseg = block_size // seg
    raw = jnp.asarray(raw, jnp.uint8)
    raw_len = jnp.asarray(raw_len, jnp.int32)
    nb, slot = raw.shape
    assert slot >= block_size
    big = block_size > 65536

    # ---- pass 1 ----
    ng1 = -(-nb // LANES)
    nb1 = ng1 * LANES
    rawm = raw[:, :block_size]
    cpos = jax.lax.broadcasted_iota(jnp.int32, (nb, block_size), 1)
    rawm = jnp.where(cpos < raw_len[:, None], rawm, 0)
    if nb1 != nb:
        rawm = jnp.pad(rawm, ((0, nb1 - nb), (0, 0)))
        raw_len = jnp.pad(raw_len, (0, nb1 - nb))
    if big:
        # blocks beyond the pos16 sort range: piecewise candidates
        # (64 KiB pieces + half-shifted straddle stretches, merged —
        # golden.dense_candidates_piecewise)
        cand_bm, gaps_bm = _piecewise_cand(rawm, raw_len, block_size,
                                           depth, interpret)
        cand = gaps = None
    else:
        # global per-block candidates (block-per-lane groups)
        np_ = 1 << max(block_size - 1, 1).bit_length()
        g8 = rawm.reshape(ng1, LANES, block_size)
        gl = raw_len.reshape(ng1, LANES)
        tapes1 = jnp.stack([LK.pack_tapes(g8[g], gl[g])
                            for g in range(ng1)])
        sw1 = _roundup(max(tapes1.shape[1] + 8, np_ // 4 + 8), BAND)
        tapes1 = jnp.pad(tapes1,
                         ((0, 0), (0, sw1 - tapes1.shape[1]), (0, 0)))
        nlane1 = gl.reshape(ng1, 1, LANES)
        if mlen:
            # wb-elimination mode: verified candidates + mcode tape
            # (exact capped mlen/catch-up) from the payload-carrying
            # sort; the parse then runs VFY as pure arithmetic
            assert depth == 1, "mlen is a greedy-path mode"
            cand, gaps, _dens = _cand_call(
                tapes1, nlane1, np_, interpret,
                mlen_mode=np_ <= 16384, mlen_hbm=np_ > 16384)
        elif depth > 1:
            cand, gaps, _dens = _cand_call(tapes1, nlane1, np_, interpret,
                                           depth=depth)
        else:
            cand, _dens = _cand_call(tapes1, nlane1, np_, interpret)
            gaps = None

    # ---- re-layout candidates to segment lanes ----
    ng2 = ng1 * nseg                 # 128 segments per parse group

    def _flat_rows(tape, dist=True):
        """(ng1, NP, 128) position-ordered rows -> (nb1*nseg, seg)
        payload halfwords, row b*nseg + k = segment k of block b.
        dist: the halfword is a match DISTANCE (window-filtered);
        False for code payloads (the mcode tape)."""
        outs = []
        for g in range(ng1):
            v = tape[g] & 0xFFFF                     # payload halfword
            if window < 65536 and dist:
                # drop candidates beyond the per-lane tape window (the
                # -64 guard keeps every banded window read in-tape)
                v = jnp.where(v > window - 64, 0, v)
            bm = jax.lax.optimization_barrier(v.T)   # (128, NP)
            outs.append(bm[:, :block_size].reshape(LANES * nseg, seg))
        return jnp.concatenate(outs, axis=0)

    def _group_pack(rows, order):
        """(nb1*nseg, seg) -> (ng2, seg/2, 128) lane-major, two payload
        halfwords packed per row, lanes permuted by `order`."""
        if order is not None:
            rows = jax.lax.optimization_barrier(rows[order])
        sl = rows.reshape(ng2, LANES, seg).transpose(0, 2, 1)
        return jax.lax.optimization_barrier(
            sl[:, 0::2, :] | LK.shift_left_u(sl[:, 1::2, :], 16))

    if stage == "pass1":
        s = jnp.sum(cand_bm[:, ::37] if big else cand[:, ::37, :])
        return (jnp.zeros((nb, 1), jnp.uint8),
                s.reshape(1).astype(jnp.int32).repeat(nb),
                jnp.zeros((nb,), bool))
    candflat = cand_bm.reshape(nb1 * nseg, seg) if big else \
        _flat_rows(cand)
    # segment cost proxy = candidate-bearing positions: straggler
    # segments share lockstep groups instead of idling whole groups
    # (the block-per-lane engine's density regrouping, per segment)
    if group_key is not None:
        key = jnp.asarray(group_key, jnp.int32)
        if key.shape[0] != nb1 * nseg:
            key = jnp.pad(key, (0, nb1 * nseg - key.shape[0]))
        order = jnp.argsort(-key)
        inv = jnp.argsort(order)
    elif group_sort:
        # Grouping key = candidate density. Probed against alternatives
        # on hardware (tools/seg_groupkey_probe.py, 512 x 64 KiB):
        # per-segment TRUE nseq (oracle) 202.9 ms vs density 237.2 vs
        # candidate-run count 236.1 vs ungrouped 273.6 — a +17%
        # opportunity exists, but no pass-1-computable feature
        # approximates nseq (measured corr: dens 0.23, verified-density
        # 0.30, runs -0.36, stream length 0.43); the parse path itself
        # sets per-segment cost. Density stays the production key.
        dens = jnp.sum(candflat != 0, axis=1, dtype=jnp.int32)
        order = jnp.argsort(-dens)
        inv = jnp.argsort(order)
    else:
        order = inv = None
    candseg = _group_pack(candflat, order)
    cpr = seg // 2
    if depth > 1 or mlen:
        gflat = gaps_bm.reshape(nb1 * nseg, seg) if big else \
            _flat_rows(gaps, dist=not mlen)
        gapseg = _group_pack(gflat, order)
    else:
        gapseg = jnp.zeros((ng2, 8, LANES), jnp.int32)
    if stage == "cand":
        s = jnp.sum(candseg[:, ::37, :])
        return (jnp.zeros((nb, 1), jnp.uint8),
                s.reshape(1).astype(jnp.int32).repeat(nb),
                jnp.zeros((nb,), bool))

    # ---- per-lane windowed source tapes ----
    # Pack each block to an LE-word tape ONCE (small), then build the
    # 17x-replicated lane windows as word-aligned slices + one
    # transpose: the u8 window stack + per-group pack_tapes variant
    # measured 46 ms of the 96 ms total on v5e.
    TPAD = 256
    tw = window + seg + TPAD
    rawp = jnp.concatenate(
        [jnp.zeros((nb1, window), jnp.uint8), rawm,
         jnp.zeros((nb1, TPAD + seg), jnp.uint8)], axis=1)
    r4 = rawp.astype(jnp.int32).reshape(nb1, -1, 4)
    blockw = jax.lax.optimization_barrier(
        r4[:, :, 0] | (r4[:, :, 1] << 8) | (r4[:, :, 2] << 16)
        | (r4[:, :, 3] << 24))
    twr = tw // 4
    wins = jnp.stack(
        [blockw[:, k * seg // 4:k * seg // 4 + twr] for k in range(nseg)],
        axis=1).reshape(nb1 * nseg, twr)
    wins = jax.lax.optimization_barrier(wins[order]).reshape(
        ng2, LANES, twr).transpose(0, 2, 1)
    sw = _roundup(twr + 8, max(BAND, wb_band))
    tapes = jnp.pad(wins, ((0, 0), (0, sw - twr), (0, 0)))

    # ---- per-lane limits (LOCAL tape coordinates) ----
    ridx = jnp.arange(nb1 * nseg, dtype=jnp.int32)
    k_of = ridx % nseg
    nb_len = raw_len[ridx // nseg]
    rel = nb_len - k_of * seg
    s1l = window + jnp.clip(rel, 0, seg)
    nlf = window + rel
    lims = jnp.stack([
        s1l,
        jnp.minimum(s1l - F.MINMATCH, nlf - F.MFLIMIT),
        jnp.minimum(s1l, nlf - F.LASTLITERALS),
        window + (k_of == 0).astype(jnp.int32),
        jnp.maximum(window - k_of * seg, 0),
        (k_of == 0).astype(jnp.int32),
        jnp.zeros_like(ridx), jnp.zeros_like(ridx)], axis=1)
    lims = lims[order].reshape(ng2, LANES, 8).transpose(0, 2, 1)

    segbound = F.compress_bound(seg)
    out_cap = _roundup(segbound, 4 * BAND)
    orr = out_cap // 4
    gpr = gapseg.shape[1]

    tapes, candseg, gapseg, lims = jax.lax.optimization_barrier(
        (tapes, candseg, gapseg, lims))
    if stage == "prep":                  # timing probe: stop after prep
        s = jnp.sum(tapes[:, ::37, :]) + jnp.sum(candseg[:, ::37, :])
        return (jnp.zeros((nb, 1), jnp.uint8),
                s.reshape(1).astype(jnp.int32).repeat(nb),
                jnp.zeros((nb,), bool))
    grid_ng = ng2 if _grid_fits(sw, cpr, gpr, orr) else 1
    parse_call = pl.pallas_call(
        functools.partial(_parse_kernel, SW=sw, CPR=cpr, OR=orr,
                          accel=accel, unroll=unroll, wb_band=wb_band,
                          depth=depth, seg_w=window, mlen=mlen,
                          far_every=far_every, near_lim=near_lim,
                          debug_rounds=debug_rounds,
                          debug_modes=debug_modes),
        grid=(grid_ng,),
        in_specs=[
            pl.BlockSpec((1, sw, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, cpr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, gpr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, orr, LANES), lambda g: (g, 0, 0))] + [
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0))
            for _ in range(6)],
        out_shape=[jax.ShapeDtypeStruct((grid_ng, orr, LANES), jnp.int32)] +
        [jax.ShapeDtypeStruct((grid_ng, 1, LANES), jnp.int32)
         for _ in range(6)],
        scratch_shapes=[
            pltpu.VMEM((LCP, LANES), jnp.int32),       # cand window
            pltpu.VMEM((1, LANES), jnp.int32),         # cand window base
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wa operand
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb operand
            pltpu.VMEM((LCP, LANES), jnp.int32),       # gaps window
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb2 (deep)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb3 (deep)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb1 (lazy)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb2 (lazy)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb3 (lazy)
            pltpu.VMEM((LCP, LANES), jnp.int32),       # gaps2 window
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb4 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wb5 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb4 (depth 5)
            pltpu.VMEM((CAPW, LANES), jnp.int32),      # wbb5 (depth 5)
            pltpu.VMEM((1, LANES), jnp.int32),         # flush frontier
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    # the seg engine caps at depth 3 (piecewise candidates carry no
    # second gaps tape); the input is a placeholder
    gap2seg = jnp.zeros((ng2, 8, LANES), jnp.int32)
    if grid_ng == ng2:
        outs = parse_call(tapes, candseg, gapseg, gap2seg, lims)
    else:
        parts = [parse_call(tapes[g:g + 1], candseg[g:g + 1],
                            gapseg[g:g + 1], gap2seg[g:g + 1],
                            lims[g:g + 1])
                 for g in range(ng2)]
        outs = tuple(jax.lax.optimization_barrier(
            jnp.concatenate([p[i] for p in parts], axis=0))
            for i in range(7))
    out, slen, serr, le_l, ns_l, p1_l, m1h = outs
    if debug_modes:
        # probe-only: per-lane mode histogram + slab-visit rows (16
        # rows per lane, written over the stream tape head)
        return out[:, :16, :], slen.reshape(-1), serr.reshape(-1)
    if seg_nseq:
        # probe-only: per-SEGMENT sequence counts in original segment
        # order (grouping-key experiments)
        return (ns_l.reshape(-1)[inv] if inv is not None
                else ns_l.reshape(-1)), slen.reshape(-1), serr.reshape(-1)
    if stage == "parse":                 # timing probe: stop after kernel
        s = jnp.sum(out[:, ::37, :]) + jnp.sum(slen) + jnp.sum(serr)
        return (jnp.zeros((nb, 1), jnp.uint8),
                s.reshape(1).astype(jnp.int32).repeat(nb),
                jnp.zeros((nb,), bool))

    # assembly engine choice (static): the Pallas concat kernel needs
    # the whole per-lane source column VMEM-resident; beyond that the
    # vmapped-DUS path remains (slow — see asm_seg.py docstring)
    orr_s = out.shape[1]
    HW_words = _roundup(-(-(1 + (max(block_size, 65536) // 255) + 2) // 4)
                        + 1, 8)
    SWR_rows = nseg * orr_s + nseg * HW_words + block_size // 4
    OUT_rows = _roundup(F.compress_bound(block_size), 4 * BAND) // 4
    use_asm_kernel = ((SWR_rows + OUT_rows) * LANES * 4
                      < 108 * 1024 * 1024) and SWR_rows % BAND == 0

    if use_asm_kernel:
        streams = None
        streams_w = jnp.concatenate(
            [out[g].T for g in range(ng2)], axis=0)      # (nb1*nseg, orr)
        streams_w = jax.lax.optimization_barrier(streams_w[inv])
    else:
        streams = jnp.concatenate(
            [LK.unpack_tapes(out[g]) for g in range(ng2)], axis=0)
        streams = jax.lax.optimization_barrier(streams[inv])
    slen = slen.reshape(-1)[inv]
    serr = serr.reshape(-1)[inv]
    le_l = le_l.reshape(-1)[inv]
    ns_l = ns_l.reshape(-1)[inv]
    p1_l = p1_l.reshape(-1)[inv]
    m1h = m1h.reshape(-1)[inv]

    # ---- run headers (token' + literal LSIC per owner segment) ----
    gb = k_of * seg - window
    hasm = LK.shift_right_u(m1h.reshape(1, -1), 16).reshape(-1) != 0
    m1 = m1h & 0xFFFF
    p1g = (p1_l + gb).reshape(nb1, nseg)
    m1_2 = m1.reshape(nb1, nseg)
    hasm2 = hasm.reshape(nb1, nseg)
    le_g = (le_l + gb).reshape(nb1, nseg)
    kk = jnp.broadcast_to(jnp.arange(nseg, dtype=jnp.int32), (nb1, nseg))
    BIGI = jnp.int32(1 << 20)
    idx = jnp.where(hasm2, kk, BIGI)
    suf = jnp.flip(jax.lax.cummin(jnp.flip(idx, -1), axis=1), -1)
    nxt = jnp.concatenate([suf[:, 1:], jnp.full((nb1, 1), BIGI,
                                                jnp.int32)], axis=1)
    has_nxt = nxt < BIGI
    nxt_c = jnp.minimum(nxt, nseg - 1)
    run_end = jnp.where(has_nxt,
                        jnp.take_along_axis(p1g, nxt_c, axis=1),
                        raw_len[:nb1, None])
    mcn = jnp.where(has_nxt,
                    jnp.minimum(jnp.take_along_axis(m1_2, nxt_c, axis=1),
                                F.ML_MASK), 0)
    owner = hasm2 | (kk == 0)
    lrun = jnp.maximum(run_end - le_g, 0)
    q = lrun - F.RUN_MASK
    nff = jnp.maximum(q, 0) // 255
    remb = jnp.maximum(q, 0) - 255 * nff
    hlen = jnp.where(owner, 1 + jnp.where(q >= 0, nff + 1, 0), 0)
    tokp = (jnp.minimum(lrun, F.RUN_MASK) << F.ML_BITS) | mcn
    # a literal run can span every bodiless segment of the block
    HMAX = 1 + (max(block_size, 65536) // 255) + 2   # 260 at 64 KiB
    hj = jnp.arange(HMAX, dtype=jnp.int32)
    hdr = jnp.where(hj[None, None, :] == 0, tokp[..., None],
          jnp.where(hj[None, None, :] <= nff[..., None], 255,
          jnp.where(hj[None, None, :] == nff[..., None] + 1,
                    remb[..., None], 0)))
    hdr = jnp.where((hj[None, None, :] < hlen[..., None]), hdr, 0)
    hdr = hdr.astype(jnp.uint8).reshape(nb1 * nseg, HMAX)

    tl = (s1l - le_l).reshape(nb1, nseg)
    bound = F.compress_bound(block_size)
    slen2 = slen.reshape(nb1, nseg)
    hlen2 = jnp.where(owner, hlen, 0)
    leg2 = jnp.maximum(le_g, 0)

    if use_asm_kernel:
        # ---- device assembly: Pallas piece-lockstep concat kernel ----
        from .asm_seg import assemble_segments
        HW = HW_words
        hdr_pad = jnp.pad(hdr.astype(jnp.int32),
                          ((0, 0), (0, 4 * HW - HMAX)))
        h4 = hdr_pad.reshape(nb1 * nseg, HW, 4)
        hdr_w = (h4[:, :, 0] | (h4[:, :, 1] << 8) | (h4[:, :, 2] << 16)
                 | (h4[:, :, 3] << 24)).reshape(nb1, nseg * HW)
        raww = block_size // 4
        raw_w = blockw[:, window // 4:window // 4 + raww]
        src_col = jnp.concatenate(
            [streams_w.reshape(nb1, nseg * orr_s), hdr_w, raw_w], axis=1)
        ng_a = nb1 // LANES
        src_t = jax.lax.optimization_barrier(
            src_col.reshape(ng_a, LANES, SWR_rows).transpose(0, 2, 1))
        # plan: rows 3k/3k+1/3k+2 = piece byte lengths; rows 3*nseg+k =
        # absolute tail source byte offsets
        lens = jnp.stack([slen2, hlen2, tl], axis=2).reshape(nb1,
                                                            3 * nseg)
        toff = 4 * (nseg * orr_s + nseg * HW) + leg2
        PR = _roundup(4 * nseg, 8)
        plan = jnp.concatenate(
            [lens, toff, jnp.zeros((nb1, PR - 4 * nseg), jnp.int32)],
            axis=1)
        plan_t = plan.reshape(ng_a, LANES, PR).transpose(0, 2, 1)
        out_w, olen_w = assemble_segments(
            src_t, plan_t, nseg=nseg, ocw=orr_s, hw=HW, raww=raww,
            out_rows=OUT_rows, interpret=interpret)
        data = jnp.concatenate(
            [LK.unpack_tapes(out_w[g]) for g in range(ng_a)], axis=0)
        out_len = olen_w.reshape(-1)[:nb1]
    else:
        # ---- vmapped-DUS fallback (block sizes whose source column
        # exceeds VMEM: 512 KiB - 4 MiB). A binary merge tree was
        # built and MEASURED WORSE here (config-6 probe: +184 ms vs
        # this loop at 1 MiB — the bound-padded piece tapes multiply
        # traffic faster than the log-factor saves; XLA fuses this
        # flat in-place update chain better than predicted). ----
        ocb = streams.shape[1]
        abound = _roundup(bound + 4 * nseg + 64 + max(ocb, seg, HMAX),
                          128)
        rawt = jnp.concatenate([rawm, jnp.zeros((nb1, seg), jnp.uint8)],
                               axis=1)
        streams2 = streams.reshape(nb1, nseg, ocb)
        hdr2 = hdr.reshape(nb1, nseg, HMAX)

        def asm_one(st_b, hd_b, raw_b, sl_b, hl_b, le_b, tl_b):
            outb = jnp.zeros((abound,), jnp.uint8)
            off = jnp.int32(0)
            for k in range(nseg):
                outb = jax.lax.dynamic_update_slice(outb, st_b[k], (off,))
                off = off + sl_b[k]
                outb = jax.lax.dynamic_update_slice(outb, hd_b[k], (off,))
                off = off + hl_b[k]
                tail = jax.lax.dynamic_slice(raw_b, (le_b[k],), (seg,))
                outb = jax.lax.dynamic_update_slice(outb, tail, (off,))
                off = off + tl_b[k]
            outb = jnp.where(jnp.arange(abound) < off, outb, 0)
            return outb, off

        data, out_len = jax.vmap(asm_one)(streams2, hdr2, rawt, slen2,
                                          hlen2, leg2, tl)
    if debug_rounds:                     # serr carries per-lane rounds
        return (data[:nb, :bound], out_len[:nb],
                serr.reshape(nb1, nseg)[:nb])
    err_b = (jnp.max(serr.reshape(nb1, nseg), axis=1) != 0) \
        | (out_len > bound)
    out_len = jnp.where(err_b, 0, out_len)
    if return_nseq:
        nseq_b = jnp.sum(ns_l.reshape(nb1, nseg), axis=1)
        return (data[:nb, :bound], out_len[:nb], err_b[:nb], nseq_b[:nb])
    return (data[:nb, :bound], out_len[:nb], err_b[:nb])
