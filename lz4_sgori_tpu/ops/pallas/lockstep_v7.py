"""Lane-lockstep LZ4 decoder v7: hot-window writes over the v6 ring.

Round-3 measured decomposition of the v6 engine at 64 KiB/4 groups
(tools/v6_probe.py, 50.3 ms total): zero-span machine ~24 ms, far scans
~12 ms (nofar), flush walks ~4 ms (noflush), refill+reduce syncs ~10 ms.
Interleaving two whole groups per kernel measured ZERO gain (streams=2:
50.96 vs 50.29 ms), so the machine is issue-THROUGHPUT-bound — the only
lever is executing fewer vector ops per sequence.

v6 pays two `place_ring` blends into the (SR=512,128) staging ring per
sub-round; each touches all SR rows (slot-select loop + full-ring
mask blend). v7 splits the staging in two:

  * a HOT mini-ring (256 rows = 1 KiB/lane) absorbs ALL writes —
    place cost drops ~2x (4-slot select, quarter-size blend);
  * 128-byte ALIGNED frames transfer hot -> ring as they complete
    (pure slot selects, no rotate/byte-mask), amortized over ~8
    sequences; the ring serves mid-range match reads and flushes
    exactly as in v6.

Match sources by distance: d <= 4*HOT - 2*CAP reads the hot ring
(cheap quarter-size extract); larger d reads the staging ring (valid
below the transfer frontier hb) or the committed-history far scan
(d beyond hb - rspan, served once per wrapper round as in v6). Lanes
whose source window straddles the not-yet-transferred gap park until
transfers advance hb — the same parking discipline as unserved far
lanes.

State machine, parse, and error semantics are identical to v6/golden
(lz4e_decompress.c:62-460); only the output-staging geometry changed.
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
    TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE, ERR,
    CAP, CAPW, LSIC_P,
    _bcast, _sb, _lsic_scan, funnel, byte_mask,
)
from .lockstep_v4 import BAND, EW, LW, RESERVE, extract_bytes_banded
from .lockstep_v6 import (BIG, FBAND, FH, flush_ring, place_ring,
                          ring_extract_bytes)

LANES = LK.LANES
HOT = 256              # hot mini-ring rows (1 KiB per lane)
HSPAN = HOT * 4
# the hot ring holds exactly the last HSPAN output bytes at any instant
# (every write evicts equally many oldest), so any d <= HSPAN has its
# low end resident; bytes past op read garbage slots but place() masks
# them. -4 covers the extract's one-row lookahead.
HOT_D = HSPAN - 4
FROWS = 32             # transfer frame rows (128 B)


def transfer_frames(stag, hot, hb, elig):
    """Move the 128-byte frame at the transfer frontier hb from the hot
    ring into the staging ring for every eligible lane; returns
    (stag', hb'). Pure aligned slot selects — no rotate, no byte mask.
    """
    SR = stag.shape[0]
    fh = (hb >> 7) & (HOT // FROWS - 1)      # 128-B frame slot in hot
    frame = jnp.zeros((FROWS, LANES), jnp.int32)
    for s in range(HOT // FROWS):
        frame = frame | jnp.where(_bcast(fh == s, FROWS),
                                  hot[s * FROWS:(s + 1) * FROWS], 0)
    fr = (hb >> 7) & (SR // FROWS - 1)       # 128-B frame slot in ring
    parts = []
    for s in range(SR // FROWS):
        sel = _bcast(elig & (fr == s), FROWS)
        parts.append(jnp.where(sel, frame, stag[s * FROWS:(s + 1) * FROWS]))
    return jnp.concatenate(parts, axis=0), jnp.where(elig, hb + 128, hb)


def _round(st, stag, hot, fl, served, loc, locb, scr, clen, olen,
           run_ok=None):
    """Advance every live lane through up to one sequence (hot edition).

    All writes land in the hot ring at op mod HSPAN; headroom is the
    transfer frontier: k <= hb + HSPAN - op. served: far lanes whose
    committed-history window sits in `scr` (wrapper-loaded); unserved
    far lanes and gap lanes (source above the ring's transfer frontier
    but beyond the hot span) park in MATCH until service/transfers.
    run_ok (1,128) bool: extra lane gate (the v8 big-block shell parks
    lanes whose comp position left the resident comp-ring window).
    """
    SR = stag.shape[0]
    rspan = SR * 4
    mode, ip, op, hb = st["mode"], st["ip"], st["op"], st["hb"]
    lit, mlen, acc = st["lit"], st["mlen"], st["acc"]
    ml0, d = st["ml0"], st["d"]
    run = mode < DONE
    if run_ok is not None:
        run = run & run_ok
    head = hb + HSPAN - op                   # hot headroom

    t = ip - locb
    cw = ring_extract_bytes(loc, t, EW)
    b = [_sb(cw, j) for j in range(LSIC_P + 2)]

    # ---- phase H: literal header ----
    tok_l = run & (mode == TOK)
    cont_l = run & (mode == LLSIC)
    ll0 = b[0] >> F.ML_BITS
    tok_ml0 = b[0] & F.ML_MASK
    # ONE merged LSIC scan for both entry modes: token lanes scan bytes
    # 1..P, continuation lanes 0..P-1 — per-byte source select, then a
    # single chain walk (the two separate scans were ~10% of the
    # sub-round's instruction budget; the machine is issue-bound,
    # docs/Performance.md round-3 ceiling analysis)
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

    # ---- phase L: literal range copy (into the hot ring) ----
    l_run = run & (mode == LIT)
    avail = EW * 4 - cons - 3
    k_l = jnp.clip(jnp.minimum(jnp.minimum(lit, head),
                               jnp.minimum(jnp.int32(CAP), avail)), 0)
    k_l = jnp.where(l_run, k_l, 0)
    lit_src = funnel(cw, cons, CAPW)
    hot = place_ring(hot, lit_src, op & (HSPAN - 1), k_l)
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
    # merged match-LSIC scan (same trick as phase H)
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

    # ---- phase M: match range copy (hot or committed source) ----
    # No staging-ring read on this path at all: d <= HOT_D reads the hot
    # ring; anything longer is served from the committed-history scan
    # once per wrapper round (the wrapper's `served` requires the whole
    # window flushed, and flushes fire on demand for waiting lanes), so
    # the (SR,128) ring extract v6 paid every sub-round is gone.
    m_run = run & (mode == MATCH)
    src = op - d
    use_hot = m_run & (d <= HOT_D)
    is_far = m_run & ~use_hot
    m_run = m_run & (use_hot | served)       # unserved far lanes park
    k_m = jnp.clip(jnp.minimum(jnp.minimum(mlen, head),
                               jnp.minimum(jnp.int32(CAP), d)), 0)
    k_m = jnp.where(m_run, k_m, 0)
    srcc = jnp.where(m_run, src, op)
    s_hot = ring_extract_bytes(hot, srcc & (HSPAN - 1), CAPW)
    msrc = jnp.where(_bcast(use_hot, CAPW), s_hot, scr)
    hot = place_ring(hot, msrc, op & (HSPAN - 1), k_m)
    op = op + k_m
    mlen = mlen - k_m
    d = jnp.where(m_run & (k_m == d) & (d < CAP), 2 * d, d)
    mode = jnp.where(m_run & (mlen == 0), TOK, mode)

    st2 = dict(mode=mode, ip=ip, op=op, hb=hb, lit=lit, mlen=mlen,
               acc=acc, ml0=ml0, d=d, rounds=st["rounds"] + 1)
    return st2, stag, hot


def _kernel(comp_ref, clen_ref, olen_ref, out_ref, len_ref, err_ref,
            loc_ref, locb_ref, scr_ref, fl_ref, *, CR: int, OR: int,
            sr: int, unroll: int = 4, transfers: int = 2,
            debug_rounds: bool = False, nofar: bool = False,
            noflush: bool = False):
    g = 0
    clen = clen_ref[0]
    olen = olen_ref[0]

    z = clen * 0
    st = dict(mode=z, ip=z, op=z, hb=z, lit=z, mlen=z, acc=z, ml0=z,
              d=z, rounds=z)
    LWU = 1 << (LW * unroll - 1).bit_length()
    locb_ref[...] = z - LWU * 8
    fl_ref[...] = z
    max_rounds = jnp.int32(4 * (CR + OR) + 4096)
    blog = BAND.bit_length() - 1
    fblog = FBAND.bit_length() - 1
    fhlog = FH.bit_length() - 1
    rspan = sr * 4

    def cond(c):
        st, _stag, _hot = c
        return jnp.any(st["mode"] < DONE) & jnp.all(
            st["rounds"] < max_rounds)

    def body(c):
        st, stag, hot = c
        fl = fl_ref[...]
        mode, ip, op, d = st["mode"], st["ip"], st["op"], st["d"]
        hb = st["hb"]
        live = mode < DONE

        # ---- batched round-start decisions ----
        t = ip - locb_ref[...]
        r_need = live & (t > LWU * 4 - unroll * RESERVE)
        # far = any source beyond the hot span; serving needs the whole
        # window committed (the sub-round reads scr only), so waiting
        # lanes demand a flush first
        far_wait = live & (mode == MATCH) & (d > HOT_D)
        flushed_ok = (op - d + 4 * CAPW) <= fl * 4
        served = far_wait & flushed_ok
        # flush margin: transfers advance hb by <= transfers*128 a round
        f_need = (live & (hb + (transfers + 1) * 128 > fl * 4 + rspan)) \
            | (far_wait & ~flushed_ok)
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
        hbr = hb >> 2
        nfl = jnp.maximum(((hbr - fl) >> fhlog) << fhlog, 0)
        wb_lo = jnp.min(jnp.where(nfl > 0, fl, BIG)) >> blog
        wb_hi = (jnp.max(jnp.where(nfl > 0, fl + nfl, 0)) + BAND - 1) \
            >> blog

        @pl.when((packed & 255) != 0)
        def _refill():
            loc_ref[...] = extract_bytes_banded(
                comp_ref, g, ipc, LWU, CR, bounds=(rb_lo, rb_hi))
            locb_ref[...] = ipc

        @pl.when(((packed >> 16) & 255) != 0)
        def _do_flush():
            if not noflush:
                flush_ring(stag, out_ref, g, fl, nfl, OR,
                           bounds=(wb_lo, wb_hi))
            fl_ref[...] = fl + nfl

        if not nofar:
            @pl.when(((packed >> 8) & 255) != 0)
            def _far_read():
                scr_ref[...] = extract_bytes_banded(
                    out_ref, g, scan_src, CAPW, OR, bounds=(fb_lo, fb_hi),
                    band=FBAND)

        fl2 = fl_ref[...]

        # ---- hot -> ring frame transfers (after the flush so the
        # ring-overwrite guard sees this round's frontier). Ungated
        # vector selects: any completed 128-B frame moves eagerly —
        # the hot ring keeps its history either way (hb only gates the
        # staging ring's read availability), and a pl.when bounce of
        # the carried ring through scratch would cost more than the
        # selects it skips. ----
        hb2 = hb
        for _ in range(transfers):
            elig = (op - hb2 >= 128) & (fl2 >= (hb2 >> 2) + FROWS - sr)
            stag, hb2 = transfer_frames(stag, hot, hb2, elig)
        st = dict(st)
        st["hb"] = hb2

        none = served != served
        cur = (st, stag, hot)
        for u in range(unroll):
            stx, stagx, hotx = cur
            stx, stagx, hotx = _round(stx, stagx, hotx, fl2,
                                      served if u == 0 else none,
                                      loc_ref[...], locb_ref[...],
                                      scr_ref[...], clen, olen)
            cur = (stx, stagx, hotx)
        return cur

    st, stag, hot = jax.lax.while_loop(
        cond, body, (st, _bcast(z, sr), _bcast(z, HOT)))

    # ---- drain: transfer every remaining (incl. partial) frame ----
    def drain(i, c):
        st, stag = c
        hb = st["hb"]
        fl = fl_ref[...]
        hbr = hb >> 2
        nfl = jnp.maximum(((hbr - fl) >> fhlog) << fhlog, 0)
        if not noflush:
            flush_ring(stag, out_ref, g, fl, nfl, OR)
        fl_ref[...] = fl + nfl
        elig = (st["hb"] < st["op"]) \
            & (fl + nfl >= ((st["hb"] >> 2) + FROWS - sr))
        stag, hb = transfer_frames(stag, hot, st["hb"], elig)
        st = dict(st)
        st["hb"] = hb
        return st, stag

    st, stag = jax.lax.fori_loop(0, HOT // FROWS + 1, drain, (st, stag))
    fl = fl_ref[...]
    flush_ring(stag, out_ref, g, fl, jnp.int32(OR) - fl, OR,
               byte_lim=st["op"])
    err = (st["mode"] != DONE).astype(jnp.int32)
    len_ref[0] = jnp.where(err != 0, 0, st["op"])
    err_ref[0] = st["rounds"] if debug_rounds else err


@functools.partial(jax.jit,
                   static_argnames=("out_size", "sr", "unroll", "interpret",
                                    "sort", "transfers", "debug_rounds",
                                    "nofar", "noflush"))
def decompress_blocks_lockstep_v7(comp, comp_len, out_size: int,
                                  sr: int = 512, unroll: int = 4,
                                  interpret: bool = False,
                                  sort: bool = True,
                                  sort_key=None,
                                  transfers: int = 2,
                                  debug_rounds: bool = False,
                                  nofar: bool = False,
                                  noflush: bool = False):
    """Decode a batch of independent LZ4 blocks (v7 hot-ring engine).

    Same contract as decompress_blocks_lockstep_v6: comp uint8 [B, slot]
    zero-padded, comp_len int32 [B], static out_size -> (out uint8
    [B, out_size], out_len int32 [B], err bool [B]); err mirrors
    golden.decompress exactly (lz4e_decompress.c:62-460 semantics).
    """
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    while sr > 2 * HOT and sr * 4 > 2 * max(out_size, 8 * HOT):
        sr //= 2
    out_cap = -(-max(out_size, 1) // (4 * FBAND)) * (4 * FBAND)
    ng = -(-nb // LANES)
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

    LWU = 1 << (LW * unroll - 1).bit_length()
    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, CR=cr, OR=orr, sr=sr, unroll=unroll,
                          transfers=transfers, debug_rounds=debug_rounds,
                          nofar=nofar, noflush=noflush),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, cr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LWU, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((CAPW, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),   # flush frontier rows
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
