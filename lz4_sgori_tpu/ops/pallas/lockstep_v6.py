"""Lane-lockstep LZ4 decoder v6: per-lane ring staging, no window sync.

v4 (lockstep_v4.py) synchronizes all 128 lanes at every sr-word window
boundary, which costs twice (docs/Performance.md, round_sim4 tables):

  * every lane waits for the slowest lane in every 2 KiB window —
    10,035 lockstep rounds on the bench corpus vs the 3,728 a mean lane
    needs — so unrolling past 2 only multiplies parked sub-steps;
  * a match is "far" (committed-history banded scan) whenever its source
    is below win_base, so even an offset-8 match right after a window
    boundary pays the scan.

v6 makes the staging buffer a per-lane RING holding the last sr*4 bytes
of that lane's own output (ring byte = op mod sr*4). Lanes never park at
boundaries; each lane owns a flush pointer, and a shared banded
read-modify-write walk commits BAND-aligned row chunks of every lane's
ring to the out tape whenever any lane nears ring-full. A match is far
only when its offset exceeds the ring span (d > sr*4) — position
q >= op - sr*4 is always resident at ring slot q mod sr*4. Unroll depth
finally scales: one while-cond, one comp-window refill, one far scan and
one flush check amortize over `unroll` sequences per round.

State machine, parse, and error semantics are identical to v4 (golden
.decompress, lz4e_decompress.c:62-460); only the output-staging geometry
changed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import format as F
from . import lockstep as LK
from .lockstep import (
    TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE, ERR,
    CAP, CAPW, LSIC_P, FR,
    _iota_rows, _bcast, _sb, _lsic_scan,
    byteshift_up, byteshift_down, rotate_up, rotate_down, funnel,
    byte_mask,
)
from .lockstep_v4 import BAND, EW, LW, RESERVE, extract_bytes_banded

LANES = LK.LANES
FH = 64            # flush granularity in rows (== BAND: slab-aligned)
FBAND = 64         # far-scan slab rows (256 measured slower end-to-end)
BIG = 0x40000000   # plain int: a jnp scalar here would be captured as a
                   # constant by pallas kernel bodies


def ring_extract_rows(stag, row0, w: int):
    """Per-lane ring window: out[i, L] = stag[(row0[L] + i) mod SR, L].

    stag (SR,128) with SR a power-of-two multiple of BAND; row0 (1,128)
    already reduced mod SR; w <= BAND. One wraparound band-select pass.
    """
    SR = stag.shape[0]
    assert w <= BAND and SR % BAND == 0 and SR & (SR - 1) == 0
    nb = SR // BAND
    blog = BAND.bit_length() - 1
    b_idx = row0 >> blog                       # in [0, nb)
    lo = jnp.zeros((BAND, LANES), jnp.int32)
    hi = jnp.zeros((BAND, LANES), jnp.int32)
    for b in range(nb):
        seg = stag[b * BAND:(b + 1) * BAND]
        lo = jnp.where(_bcast(b_idx == b, BAND), seg, lo)
        hi = jnp.where(_bcast((b_idx + 1) & (nb - 1) == b, BAND), seg, hi)
    win = jnp.concatenate([lo, hi], axis=0)
    return rotate_up(win, row0 - (b_idx << blog), 2 * BAND)[:w]


def ring_extract_bytes(stag, bytepos, w: int):
    """Per-lane ring byte window: out[i,L] = LE word of ring bytes
    (bytepos[L] + 4i ..+3) mod 4*SR; bytepos already reduced mod 4*SR."""
    win = ring_extract_rows(stag, bytepos >> 2, w + 1)
    return byteshift_up(win, bytepos & 3)[:w]




def place_ring(stag, stream, dst_rel, k):
    """lockstep.place with ring wraparound: a write whose frame pair
    crosses the staging end continues at slot 0. dst_rel (1,128) is the
    ring byte offset (already mod 4*SR); k in [0, CAP]."""
    SR = stag.shape[0]
    Wp = stream.shape[0]
    fo = dst_rel & (FR * 4 - 1)
    f = dst_rel >> (2 + FR.bit_length() - 1)
    pad = jnp.concatenate(
        [stream, jnp.zeros((2 * FR - Wp, LANES), jnp.int32)], axis=0)
    df = byteshift_down(rotate_down(pad, fo >> 2, 2 * FR), fo & 3)
    bm = byte_mask(2 * FR, fo, fo + jnp.maximum(k, 0))
    dfm = df & bm
    nsl = SR // FR
    vals = []
    msks = []
    for s in range(nsl):
        is_lo = _bcast(f == s, FR)
        is_hi = _bcast((f + 1) & (nsl - 1) == s, FR)
        vals.append(jnp.where(is_lo, dfm[:FR], 0)
                    | jnp.where(is_hi, dfm[FR:], 0))
        msks.append(jnp.where(is_lo, bm[:FR], 0)
                    | jnp.where(is_hi, bm[FR:], 0))
    sv = jnp.concatenate(vals, axis=0)
    sm = jnp.concatenate(msks, axis=0)
    return (stag & ~sm) | sv


def flush_ring(stag, out_ref, g, fl, nfl, OR: int, byte_lim=None,
               bounds=None):
    """Commit ring rows [fl, fl+nfl) of every lane to the out tape.

    fl/nfl (1,128) rows, both BAND-aligned unless byte_lim is given (the
    final flush): then rows cover [fl, fl+nfl) arbitrarily and only ring
    bytes below byte_lim land — bytes past it are written as ZERO (rows
    are fully overwritten, keeping the golden zero-pad contract without a
    whole-tape init). Walks slabs [min fl, max fl+nfl) once, shared by
    all lanes; each visit is one dynamic-sublane RMW.
    """
    SR = stag.shape[0]
    nb = SR // BAND
    blog = BAND.bit_length() - 1
    if bounds is None:
        live = nfl > 0
        lo = jnp.min(jnp.where(live, fl, BIG))
        hi = jnp.max(jnp.where(live, fl + nfl, 0))
        b_lo = lo >> blog
        b_hi = (hi + BAND - 1) >> blog
    else:
        b_lo, b_hi = bounds

    def body(b, carry):
        bc = jnp.minimum(b << blog, jnp.int32(OR - BAND))
        ringslab = jnp.zeros((BAND, LANES), jnp.int32)
        for s in range(nb):
            ringslab = jnp.where(
                _bcast(b & (nb - 1) == s, BAND),
                stag[s * BAND:(s + 1) * BAND], ringslab)
        absr = _bcast(b << blog, BAND) + _iota_rows(BAND)
        m = (absr >= _bcast(fl, BAND)) & (absr < _bcast(fl + nfl, BAND))
        cur = out_ref[g, pl.ds(bc, BAND), :]
        if byte_lim is None:
            out = jnp.where(m, ringslab, cur)
        else:
            bm = jnp.zeros((BAND, LANES), jnp.int32)
            for kk in range(4):
                inb = absr * 4 + kk < _bcast(byte_lim, BAND)
                bm = bm | jnp.where(
                    inb, jnp.int32(np.int32(np.uint32(255) << (8 * kk))), 0)
            out = jnp.where(m, ringslab & bm, cur)
        out_ref[g, pl.ds(bc, BAND), :] = out
        return carry

    jax.lax.fori_loop(b_lo, b_hi, body, 0)


def _round(st, stag, fl, served, loc, locb, scr, clen, olen):
    """Advance every live lane through up to one sequence (ring edition).

    fl (1,128): per-lane flushed frontier in rows. Writes clamp to the
    unflushed headroom fl*4 + 4*SR - op (a hard guard; the round wrapper
    flushes before it binds). served (1,128) bool: lanes whose far-match
    source window sits in `scr` (loaded by the round wrapper); far
    lanes not served park in MATCH until the next round's service.
    Refill, far service, and flush all live in the round wrapper so their
    vector->scalar decisions batch into one sync. loc/locb/scr are plain
    VALUES read once per wrapper round (they only change in the wrapper).
    """
    SR = stag.shape[0]
    rspan = SR * 4
    mode, ip, op = st["mode"], st["ip"], st["op"]
    lit, mlen, acc = st["lit"], st["mlen"], st["acc"]
    ml0, d = st["ml0"], st["d"]
    run = mode < DONE
    head = fl * 4 + rspan - op               # unflushed ring headroom

    t = ip - locb
    # banded sub-window then a small rotate: funnel() would rotate the
    # whole (LWU,128) window (~0.6 us at LWU=512); this is ~0.15 us.
    # The circular hi-band wrap is harmless: the used rows [t>>2, +EW]
    # never cross the window end (RESERVE covers each sub-step).
    cw = ring_extract_bytes(loc, t, EW)
    b = [_sb(cw, j) for j in range(LSIC_P + 2)]

    # ---- phase H: literal header ----
    tok_l = run & (mode == TOK)
    cont_l = run & (mode == LLSIC)
    ll0 = b[0] >> F.ML_BITS
    tok_ml0 = b[0] & F.ML_MASK
    # merged LSIC scan for both entry modes (see lockstep_v7._round)
    live0_h = (tok_l & (ll0 == 15)) | cont_l
    mb = [jnp.where(tok_l, b[j + 1], b[j]) for j in range(LSIC_P)]
    ext_h, cons_h, live_h = _lsic_scan(mb, live0_h)
    to_llsic = live_h
    to_lit = (tok_l | cont_l) & ~live_h
    lit_new = jnp.where(tok_l, ll0 + jnp.where(ll0 == 15, ext_h, 0),
                        acc + ext_h)
    cons = jnp.where(tok_l, 1 + cons_h, jnp.where(cont_l, cons_h, 0))
    acc = jnp.where(to_llsic, lit_new, acc)
    ml0 = jnp.where(tok_l, tok_ml0, ml0)
    ip = ip + cons
    err_h = to_lit & ((ip > clen) | (ip + lit_new > clen)
                      | (op + lit_new > olen))
    mode = jnp.where(err_h, ERR,
                     jnp.where(to_llsic, LLSIC,
                               jnp.where(to_lit, LIT, mode)))
    lit = jnp.where(to_lit & ~err_h, lit_new, lit)

    # ---- phase L: literal range copy (source: the parse window) ----
    l_run = run & (mode == LIT)
    avail = EW * 4 - cons - 3
    k_l = jnp.clip(jnp.minimum(jnp.minimum(lit, head),
                               jnp.minimum(jnp.int32(CAP), avail)), 0)
    k_l = jnp.where(l_run, k_l, 0)
    lit_src = funnel(cw, cons, CAPW)
    stag = place_ring(stag, lit_src, op & (rspan - 1), k_l)
    op = op + k_l
    ip = ip + k_l
    cons = cons + k_l
    lit = lit - k_l
    head = head - k_l
    lit_done = l_run & (lit == 0)
    at_end = lit_done & (ip == clen)
    mode = jnp.where(at_end, DONE, jnp.where(lit_done, OFF, mode))

    # ---- phase O: offset + match-length header ----
    o_l = run & (mode == OFF)
    m_l = run & (mode == MLSIC)
    ow = funnel(cw, cons, 4)
    ob = [_sb(ow, j) for j in range(LSIC_P + 2)]
    o16 = ob[0] | (ob[1] << 8)
    err_o = o_l & ((ip + 2 > clen) | (o16 == 0) | (o16 > op))
    o_l = o_l & ~err_o
    live0_o = (o_l & (ml0 == 15)) | m_l
    mo = [jnp.where(o_l, ob[j + 2], ob[j]) for j in range(LSIC_P)]
    ext_o2, cons_o2, live_o2 = _lsic_scan(mo, live0_o)
    to_mlsic = live_o2
    to_match = (o_l | m_l) & ~live_o2
    mlen_new = jnp.where(
        o_l, F.MINMATCH + ml0 + jnp.where(ml0 == 15, ext_o2, 0),
        acc + ext_o2)
    cons2 = jnp.where(o_l, 2 + cons_o2, jnp.where(m_l, cons_o2, 0))
    acc = jnp.where(to_mlsic, mlen_new, acc)
    d = jnp.where(o_l, o16, d)
    ip = ip + cons2
    err_m = to_match & ((ip > clen) | (op + mlen_new > olen))
    mode = jnp.where(err_o | err_m, ERR,
                     jnp.where(to_mlsic, MLSIC,
                               jnp.where(to_match, MATCH, mode)))
    mlen = jnp.where(to_match & ~err_m, mlen_new, mlen)

    # ---- phase M: match range copy (ring source; doubling distance) ----
    m_run = run & (mode == MATCH)
    is_far = m_run & (d > rspan)             # source below the ring span
    m_run = m_run & (~is_far | served)       # unserved far lanes park
    k_m = jnp.clip(jnp.minimum(jnp.minimum(mlen, head),
                               jnp.minimum(jnp.int32(CAP), d)), 0)
    k_m = jnp.where(m_run, k_m, 0)
    src = jnp.where(m_run, op - d, op)
    s_stg = ring_extract_bytes(stag, src & (rspan - 1), CAPW)
    use_far = is_far & served
    s_com = scr
    # committed bytes end at fl*4 per lane; ring covers the rest
    bnd = byte_mask(CAPW, jnp.zeros_like(src), fl * 4 - src)
    bnd = jnp.where(_bcast(use_far, CAPW), bnd, 0)
    msrc = (s_com & bnd) | (s_stg & ~bnd)
    stag = place_ring(stag, msrc, op & (rspan - 1), k_m)
    op = op + k_m
    mlen = mlen - k_m
    d = jnp.where(m_run & (k_m == d) & (d < CAP), 2 * d, d)
    mode = jnp.where(m_run & (mlen == 0), TOK, mode)

    st2 = dict(mode=mode, ip=ip, op=op, lit=lit, mlen=mlen, acc=acc,
               ml0=ml0, d=d, rounds=st["rounds"] + 1)
    return st2, stag


def _kernel(comp_ref, clen_ref, olen_ref, out_ref, len_ref, err_ref,
            loc_ref, locb_ref, scr_ref, fl_ref, *, CR: int, OR: int,
            sr: int, unroll: int = 4, streams: int = 1,
            debug_rounds: bool = False, nofar: bool = False,
            noflush: bool = False):
    """Decode `streams` independent 128-lane groups in one kernel body.

    streams > 1 interleaves two (or more) copies of the whole round —
    reduces, walks, and the state machine — in one instruction stream.
    The machine is issue-bound on small shapes (docs/Performance.md
    round-3 ceiling analysis), so a second independent dependency chain
    fills the stalls of the first; the batched vector->scalar reduce
    syncs also amortize across streams.
    """
    # power-of-two local window (the banded parse extract wraps mod LWU)
    LWU = 1 << (LW * unroll - 1).bit_length()
    max_rounds = jnp.int32(4 * (CR + OR) + 2048)
    margin = 2 * CAP * unroll + 8            # max advance between checks
    blog = BAND.bit_length() - 1
    fblog = FBAND.bit_length() - 1
    fhlog = FH.bit_length() - 1
    rspan = sr * 4

    clens, olens, states = [], [], []
    for s in range(streams):
        clen = clen_ref[s]
        olen = olen_ref[s]
        z = clen * 0
        st = dict(mode=z, ip=z, op=z, lit=z, mlen=z, acc=z, ml0=z, d=z,
                  rounds=z)
        locb_ref[s] = z - LWU * 8
        fl_ref[s] = z
        clens.append(clen)
        olens.append(olen)
        states.append((st, _bcast(z, sr)))

    def cond(c):
        alive = None
        for st, _stag in c:
            a = jnp.any(st["mode"] < DONE) & jnp.all(
                st["rounds"] < max_rounds)
            alive = a if alive is None else (alive | a)
        return alive

    def body(c):
        # ---- round-start decisions for ALL streams: every
        # vector->scalar reduce issues back-to-back, so their sync
        # latencies overlap (a dependent reduce-to-scalar costs ~1 us
        # each on its own) ----
        decisions = []
        for s, (st, _stag) in enumerate(c):
            fl = fl_ref[s]
            mode, ip, op, d = st["mode"], st["ip"], st["op"], st["d"]
            live = mode < DONE
            t = ip - locb_ref[s]
            r_need = live & (t > LWU * 4 - unroll * RESERVE)
            served = live & (mode == MATCH) & (d > rspan)
            f_need = live & (op + margin > fl * 4 + rspan)
            packed = jnp.sum(r_need.astype(jnp.int32)
                             + (served.astype(jnp.int32) << 8)
                             + (f_need.astype(jnp.int32) << 16))
            ip_lo = jnp.min(jnp.where(live, ip, BIG))
            ipc = jnp.where(live, ip, ip_lo)
            rb_lo = jnp.min(jnp.where(live, ipc, BIG) >> (2 + blog))
            rb_hi = jnp.max(jnp.where(live, ipc, 0) >> (2 + blog))
            src_f = jnp.where(served, op - d, BIG)
            far_lo = jnp.min(src_f)
            scan_src = jnp.where(served, op - d, far_lo)
            fb_lo = far_lo >> (2 + fblog)
            fb_hi = jnp.max(jnp.where(served, op - d, 0)) >> (2 + fblog)
            opr = op >> 2
            nfl = jnp.maximum(((opr - fl) >> fhlog) << fhlog, 0)
            wb_lo = jnp.min(jnp.where(nfl > 0, fl, BIG)) >> blog
            wb_hi = (jnp.max(jnp.where(nfl > 0, fl + nfl, 0)) + BAND - 1) \
                >> blog
            decisions.append(dict(
                fl=fl, served=served, packed=packed, ipc=ipc,
                rb=(rb_lo, rb_hi), scan_src=scan_src, fb=(fb_lo, fb_hi),
                nfl=nfl, wb=(wb_lo, wb_hi)))

        out = []
        for s, (st, stag) in enumerate(c):
            dec = decisions[s]
            packed = dec["packed"]

            @pl.when((packed & 255) != 0)
            def _refill(s=s, dec=dec):
                loc_ref[s] = extract_bytes_banded(
                    comp_ref, s, dec["ipc"], LWU, CR, bounds=dec["rb"])
                locb_ref[s] = dec["ipc"]

            @pl.when(((packed >> 16) & 255) != 0)
            def _do_flush(s=s, dec=dec, stag=stag):
                if not noflush:              # noflush: timing probe only
                    flush_ring(stag, out_ref, s, dec["fl"], dec["nfl"],
                               OR, bounds=dec["wb"])
                fl_ref[s] = dec["fl"] + dec["nfl"]

            if not nofar:                    # nofar: timing probe only
                @pl.when(((packed >> 8) & 255) != 0)
                def _far_read(s=s, dec=dec):
                    # runs after the flush: committed bytes below fl*4
                    # include this round's flushed rows. Measured:
                    # 256-row slabs LOSE to 64-row here (16.3 vs 13.2 ms
                    # end-to-end) — wider visits pay more in
                    # selects+rotate than they save in iterations.
                    scr_ref[s] = extract_bytes_banded(
                        out_ref, s, dec["scan_src"], CAPW, OR,
                        bounds=dec["fb"], band=FBAND)

        # ---- unrolled sub-rounds, streams interleaved per sub-round so
        # the scheduler sees independent dependency chains side by side
        cur = [(st, stag) for (st, stag) in c]
        vals = [(loc_ref[s], locb_ref[s], scr_ref[s], fl_ref[s])
                for s in range(streams)]
        for u in range(unroll):
            for s in range(streams):
                st, stag = cur[s]
                loc, locb, scr, fl2 = vals[s]
                served = decisions[s]["served"]
                none = served != served      # all-false, layout-derived
                st, stag = _round(st, stag, fl2,
                                  served if u == 0 else none,
                                  loc, locb, scr, clens[s], olens[s])
                cur[s] = (st, stag)
        for s in range(streams):
            out.append(cur[s])
        return tuple(out)

    final = jax.lax.while_loop(cond, body, tuple(states))

    for s, (st, stag) in enumerate(final):
        # final flush: rows [fl, OR), ring bytes below op, zeros past
        fl = fl_ref[s]
        flush_ring(stag, out_ref, s, fl, jnp.int32(OR) - fl, OR,
                   byte_lim=st["op"])
        err = (st["mode"] != DONE).astype(jnp.int32)
        len_ref[s] = jnp.where(err != 0, 0, st["op"])
        err_ref[s] = st["rounds"] if debug_rounds else err


@functools.partial(jax.jit,
                   static_argnames=("out_size", "sr", "unroll", "interpret",
                                    "sort", "streams", "debug_rounds",
                                    "nofar", "noflush"))
def decompress_blocks_lockstep_v6(comp, comp_len, out_size: int,
                                  sr: int = 512, unroll: int = 4,
                                  interpret: bool = False,
                                  sort: bool = True,
                                  sort_key=None,
                                  streams: int = 1,
                                  debug_rounds: bool = False,
                                  nofar: bool = False,
                                  noflush: bool = False):
    """Decode a batch of independent LZ4 blocks (v6 ring engine).

    comp uint8 [B, slot] zero-padded, comp_len int32 [B], static out_size
    -> (out uint8 [B, out_size], out_len int32 [B], err bool [B]); err
    mirrors golden.decompress's DecodeError cases exactly
    (lz4e_decompress.c:62-460 semantics).

    streams: independent 128-lane groups interleaved per kernel body
    (issue-bound machine stalls of one stream fill with the other's).
    """
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    while sr > FR and sr * 4 > 2 * max(out_size, 2 * FR):
        sr //= 2                             # ring no bigger than ~output
    sr = max(sr, BAND)
    out_cap = -(-max(out_size, 1) // (4 * FBAND)) * (4 * FBAND)
    ng = -(-nb // (LANES * streams)) * streams
    pad = ng * LANES - nb
    if pad:
        comp = jnp.pad(comp, ((0, pad), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, pad), constant_values=1)
        comp = comp.at[nb:, 0].set(0)
    if sort and ng > 1:
        key = comp_len if sort_key is None else \
            jnp.asarray(sort_key, jnp.int32)
        if sort_key is not None and pad:
            key = jnp.pad(key, (0, pad))
        order = jnp.argsort(key)
        inv = jnp.argsort(order)
        comp = comp[order]
        comp_len = comp_len[order]
    g8 = comp.reshape(ng, LANES, slot)
    gl = comp_len.reshape(ng, LANES)
    tapes = jax.vmap(LK.pack_tapes)(g8, gl)
    cr = tapes.shape[1]
    if cr % BAND:
        tapes = jnp.pad(tapes, ((0, 0), (0, BAND - cr % BAND), (0, 0)))
        cr = tapes.shape[1]
    orr = out_cap // 4
    olen = jnp.full((ng, 1, LANES), out_size, jnp.int32)
    clen2 = gl.reshape(ng, 1, LANES)

    S = streams
    LWU = 1 << (LW * unroll - 1).bit_length()
    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, CR=cr, OR=orr, sr=sr, unroll=unroll,
                          streams=S, debug_rounds=debug_rounds,
                          nofar=nofar, noflush=noflush),
        grid=(ng // S,),
        in_specs=[
            pl.BlockSpec((S, cr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((S, orr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((S, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, LWU, LANES), jnp.int32),
            pltpu.VMEM((S, 1, LANES), jnp.int32),
            pltpu.VMEM((S, CAPW, LANES), jnp.int32),
            pltpu.VMEM((S, 1, LANES), jnp.int32),   # flush frontier rows
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tapes, clen2, olen)

    data = jax.vmap(LK.unpack_tapes)(out)
    data = data.reshape(ng * LANES, out_cap)
    out_len = out_len.reshape(-1)
    err = err.reshape(-1)
    if sort and ng > 1:
        data = data[inv]
        out_len = out_len[inv]
        err = err[inv]
    if debug_rounds:
        return data[:nb, :out_size], out_len[:nb], err[:nb]
    return (data[:nb, :out_size], out_len[:nb], err[:nb].astype(bool))
