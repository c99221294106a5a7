"""RETIRED (round 5): lane-lockstep LZ4 decoder v9 — per-lane block CHAINS.

Kept outside the package as the measured reference point for the
makespan lever (docs/Performance.md round-4 "lane chaining", round-5
stint/chain simulator): bit-exact, but SLOWER than v7 on the span-walk
machine, and the per-lane-range walk substrate it needs (v8 DMA) costs
more than it saves at <= 64 KiB. Imports below still resolve when run
from the repo root with the package on sys.path.

Round-4 measurement (docs/Performance.md, tools/chain_sim.py): with nseq
cost hints in place, the residual decode gap to the same-block bound is
ROUND-COUNT divergence — a group of 128 lockstep lanes runs until its
slowest lane finishes, and nseq-sorted grouping is already optimal for
that sum-of-group-maxes objective. v9 changes the objective: each lane
decodes a CHAIN of `chain` blocks laid out back-to-back in its comp
column, so group cost becomes the balanced-lane makespan (~total/128).
Snake-dealt packing by decode-cost key cuts rounds 11-17% on the real
bench corpus distribution (LPT bin-packing would be 22% but is not
vectorizable; the deal must trace under jit).

MEASURED OUTCOME (round 4, 64 KiB x 512, u=6): bit-exact on hardware,
but SLOWER than v7 end-to-end — 59.6 ms at chain=2 / 69.7 ms at
chain=4 vs v7's 41.3 ms. The predicted round cut materializes, but the
shared banded walks (refill/far/flush) cost ~span-of-lane-positions
and chained lanes diverge across chain slots, inflating walk spans
~chain-fold. The engine is kept as the measured reference point: the
makespan lever pays only once walk service is per-lane-range (the v8
DMA mechanism) — see docs/Performance.md round-4 "lane chaining".

Mechanics on top of v7 (which already runs in column-absolute
coordinates):

  * comp columns hold `chain` blocks at static 4-aligned offsets
    j*SLOT4; a (chain, 128) clen tape gives each slot's length. `ip`
    and `op` stay column-absolute; per-block bounds come from `cend`
    (current block's comp end) and `obase` (current block's output
    base, cur*out_size) carried as lane state.
  * the ONLY parse change vs v7 is offset validity: `o16 > op` becomes
    `o16 > op - obase` (an offset may not reach before the current
    block's first byte — blocks in a chain are independent streams).
  * when a lane finishes a block (DONE or ERR) with chain slots left,
    it waits for its hot-ring frames to transfer (partial final frames
    are force-eligible), records that slot's out_len/err, then rebases:
    ip -> next cbase, op/hb -> next obase, machine state cleared. The
    output tail [out_len, out_size) of a short or errored block is
    unspecified bytes, exactly as in v7's single-block contract.

out_size must be a multiple of HSPAN (1 KiB) so chained output bases
stay hot-ring and frame aligned; the production use is the 16-128 KiB
band. State machine, parse, and error semantics per block are identical
to v7/golden (lz4e_decompress.c:62-460).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_sgori_tpu import format as F
from lz4_sgori_tpu.ops.pallas import lockstep as LK
from lz4_sgori_tpu.ops.pallas.lockstep import (
    TOK, LLSIC, LIT, OFF, MLSIC, MATCH, DONE, ERR,
    CAP, CAPW, LSIC_P,
    _bcast, _sb, _lsic_scan, funnel,
)
from lz4_sgori_tpu.ops.pallas.lockstep_v4 import BAND, EW, LW, RESERVE, extract_bytes_banded
from lz4_sgori_tpu.ops.pallas.lockstep_v6 import (BIG, FBAND, FH, flush_ring, place_ring,
                          ring_extract_bytes)
from lz4_sgori_tpu.ops.pallas.lockstep_v7 import HOT, HSPAN, HOT_D, FROWS, transfer_frames

LANES = LK.LANES


def _round(st, stag, hot, fl, served, loc, locb, scr, out_size):
    """One sequence step per live lane — v7's round with chain bounds.

    Identical to lockstep_v7._round except: block bounds come from
    st["cend"]/st["obase"] instead of whole-column clen/olen, and offset
    validity is checked against the current block's output span
    (o16 > op - obase). See lockstep_v7.py for the phase commentary.
    """
    mode, ip, op, hb = st["mode"], st["ip"], st["op"], st["hb"]
    lit, mlen, acc = st["lit"], st["mlen"], st["acc"]
    ml0, d = st["ml0"], st["d"]
    cend, obase = st["cend"], st["obase"]
    oend = obase + out_size
    run = mode < DONE
    head = hb + HSPAN - op

    t = ip - locb
    cw = ring_extract_bytes(loc, t, EW)
    b = [_sb(cw, j) for j in range(LSIC_P + 2)]

    # ---- phase H: literal header ----
    tok_l = run & (mode == TOK)
    cont_l = run & (mode == LLSIC)
    ll0 = b[0] >> F.ML_BITS
    tok_ml0 = b[0] & F.ML_MASK
    ext_t, cons_t, live_t = _lsic_scan(b[1:1 + LSIC_P], tok_l & (ll0 == 15))
    ext_c, cons_c, live_c = _lsic_scan(b[0:LSIC_P], cont_l)
    to_llsic = (tok_l & live_t) | (cont_l & live_c)
    to_lit = (tok_l & ~live_t) | (cont_l & ~live_c)
    lit_new = jnp.where(tok_l, ll0 + jnp.where(ll0 == 15, ext_t, 0),
                        acc + ext_c)
    cons = jnp.where(tok_l, 1 + cons_t, jnp.where(cont_l, cons_c, 0))
    acc = jnp.where(to_llsic, lit_new, acc)
    ml0 = jnp.where(tok_l, tok_ml0, ml0)
    ip = ip + cons
    err_h = to_lit & ((ip > cend) | (ip + lit_new > cend)
                      | (op + lit_new > oend))
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
    at_end = lit_done & (ip == cend)
    mode = jnp.where(at_end, DONE, jnp.where(lit_done, OFF, mode))

    # ---- phase O: offset + match-length header ----
    o_l = run & (mode == OFF)
    m_l = run & (mode == MLSIC)
    ow = funnel(cw, cons, 4)
    ob = [_sb(ow, j) for j in range(LSIC_P + 2)]
    o16 = ob[0] | (ob[1] << 8)
    err_o = o_l & ((ip + 2 > cend) | (o16 == 0) | (o16 > op - obase))
    o_l = o_l & ~err_o
    ext_o, cons_o, live_o = _lsic_scan(ob[2:2 + LSIC_P], o_l & (ml0 == 15))
    ext_m, cons_m, live_m = _lsic_scan(ob[0:LSIC_P], m_l)
    to_mlsic = (o_l & live_o) | (m_l & live_m)
    to_match = (o_l & ~live_o) | (m_l & ~live_m)
    mlen_new = jnp.where(
        o_l, F.MINMATCH + ml0 + jnp.where(ml0 == 15, ext_o, 0),
        acc + ext_m)
    cons2 = jnp.where(o_l, 2 + cons_o, jnp.where(m_l, cons_m, 0))
    acc = jnp.where(to_mlsic, mlen_new, acc)
    d = jnp.where(o_l, o16, d)
    ip = ip + cons2
    err_m = to_match & ((ip > cend) | (op + mlen_new > oend))
    mode = jnp.where(err_o | err_m, ERR,
                     jnp.where(to_mlsic, MLSIC,
                               jnp.where(to_match, MATCH, mode)))
    mlen = jnp.where(to_match & ~err_m, mlen_new, mlen)

    # ---- phase M: match range copy (hot or committed source) ----
    m_run = run & (mode == MATCH)
    src = op - d
    use_hot = m_run & (d <= HOT_D)
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

    st2 = dict(st, mode=mode, ip=ip, op=op, lit=lit, mlen=mlen,
               acc=acc, ml0=ml0, d=d, rounds=st["rounds"] + 1)
    return st2, stag, hot


def _kernel(comp_ref, clen_ref, out_ref, len_ref, err_ref,
            loc_ref, locb_ref, scr_ref, fl_ref, *res_refs, C: int,
            OUT_SIZE: int, SLOT4: int, CR: int, OR: int, sr: int,
            unroll: int = 4, transfers: int = 2,
            debug_rounds: bool = False):
    g = 0
    z = clen_ref[0, 0:1] * 0
    # per-chain-slot results live in 2C (1, 128) scratch refs updated by
    # full-ref RMW (the fl_ref pattern — the one masked-update shape the
    # v6/v7 machines prove out on Mosaic; loop-carried result rows and
    # (C,128) in-loop selects both trip layout-inference relayout
    # errors); they land in len_ref/err_ref once, at the end
    lens_refs, errs_refs = res_refs[:C], res_refs[C:]
    for r in res_refs:
        # data-dependent zero: a constant-folded init store would pin
        # the ref's layout as replicated and the in-loop RMW stores
        # (concrete lane layout) could not relayout into it
        r[...] = jnp.minimum(clen_ref[0, 0:1], 0)

    # cz: data-dependent zero (clen >= 1 on every lane) — a constant-
    # foldable init would pin carried-state layouts as replicated, and
    # the chain-transition updates then die in concrete->replicated
    # relayouts (v7's carries never read `cur`-style chained state, so
    # it never hit this)
    cz = jnp.minimum(clen_ref[0, 0:1], 0)
    st = dict(mode=cz, ip=cz, op=cz, hb=cz, lit=cz, mlen=cz, acc=cz,
              ml0=cz, d=cz, rounds=cz, cur=cz, cend=clen_ref[0, 0:1],
              obase=cz)
    LWU = 1 << (LW * unroll - 1).bit_length()
    locb_ref[...] = z - LWU * 8
    fl_ref[...] = z
    max_rounds = jnp.int32(4 * (CR + OR) + 4096 + 64 * C)
    blog = BAND.bit_length() - 1
    fblog = FBAND.bit_length() - 1
    fhlog = FH.bit_length() - 1
    rspan = sr * 4

    def record(st, m):
        # additive, not select: each (slot, lane) transitions exactly
        # once, so += masked-value ≡ masked select — and Mosaic's select
        # unifies toward the (replicated) scratch load, demanding an
        # illegal concrete->replicated relayout of the other operand,
        # while an add legally de-replicates the load instead
        blk_err = (st["mode"] != DONE).astype(jnp.int32)
        blk_len = jnp.where(blk_err != 0, 0, st["op"] - st["obase"])
        for j in range(C):
            mj = m & (st["cur"] == j)
            lens_refs[j][...] = lens_refs[j][...] + \
                jnp.where(mj, blk_len, 0)
            errs_refs[j][...] = errs_refs[j][...] + \
                jnp.where(mj, blk_err, 0)

    def cond(c):
        st, _stag, _hot = c
        return jnp.any((st["mode"] < DONE) | (st["cur"] < C - 1)) \
            & jnp.all(st["rounds"] < max_rounds)

    def body(c):
        st, stag, hot = c

        # ---- chain transitions: lanes done with slot cur < C-1 whose
        # hot frames have all transferred rebase onto the next block.
        # (Frames transfer below; a waiting lane flips `trans` on a
        # later iteration.) ----
        fin = st["mode"] >= DONE
        more = st["cur"] < C - 1
        trans = fin & more & (st["hb"] >= st["op"])

        # ungated RMW: a pl.when region here trips a Mosaic relayout
        # error on the masked store; the selects are 2C (1,128) ops/round
        record(st, trans)

        # cur/cend/obase update ARITHMETICALLY (+= masked delta), not by
        # select: a select whose both branches derive from the carried
        # value lets Mosaic keep the carry replicated (its init is a
        # constant), and every select mixing a derived-replicated
        # operand with a concrete one then dies in relayout
        nxt = st["cur"] + 1
        ncend = z
        for j in range(1, C):
            ncend = ncend | jnp.where(nxt == j,
                                      clen_ref[0, j:j + 1] + j * SLOT4, 0)
        nobase = nxt * OUT_SIZE
        st = dict(
            st,
            mode=jnp.where(trans, TOK, st["mode"]),
            ip=jnp.where(trans, nxt * SLOT4, st["ip"]),
            op=jnp.where(trans, nobase, st["op"]),
            hb=jnp.where(trans, nobase, st["hb"]),
            lit=jnp.where(trans, 0, st["lit"]),
            mlen=jnp.where(trans, 0, st["mlen"]),
            acc=jnp.where(trans, 0, st["acc"]),
            ml0=jnp.where(trans, 0, st["ml0"]),
            d=jnp.where(trans, 0, st["d"]),
            cur=st["cur"] + trans.astype(jnp.int32),
            cend=st["cend"] + jnp.where(trans, ncend - st["cend"], 0),
            obase=st["obase"]
            + jnp.where(trans, nobase - st["obase"], 0),
        )

        fl = fl_ref[...]
        mode, ip, op, d = st["mode"], st["ip"], st["op"], st["d"]
        hb = st["hb"]
        live = mode < DONE
        pend = (mode >= DONE) & (st["cur"] < C - 1)   # awaiting transfers
        act = live | pend

        # ---- batched round-start decisions (v7) ----
        t = ip - locb_ref[...]
        r_need = live & (t > LWU * 4 - unroll * RESERVE)
        far_wait = live & (mode == MATCH) & (d > HOT_D)
        flushed_ok = (op - d + 4 * CAPW) <= fl * 4
        served = far_wait & flushed_ok
        f_need = (act & (hb + (transfers + 1) * 128 > fl * 4 + rspan)) \
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
            flush_ring(stag, out_ref, g, fl, nfl, OR,
                       bounds=(wb_lo, wb_hi))
            fl_ref[...] = fl + nfl

        @pl.when(((packed >> 8) & 255) != 0)
        def _far_read():
            scr_ref[...] = extract_bytes_banded(
                out_ref, g, scan_src, CAPW, OR, bounds=(fb_lo, fb_hi),
                band=FBAND)

        fl2 = fl_ref[...]

        # ---- hot -> ring frame transfers; finished lanes with chain
        # slots left force their partial final frame through so the
        # transition gate (hb >= op) can clear ----
        hb2 = hb
        for _ in range(transfers):
            elig = ((op - hb2 >= 128) | (pend & (hb2 < op))) \
                & (fl2 >= (hb2 >> 2) + FROWS - sr)
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
                                      scr_ref[...], OUT_SIZE)
            cur = (stx, stagx, hotx)
        return cur

    st, stag, hot = jax.lax.while_loop(
        cond, body, (st, _bcast(z, sr), _bcast(z, HOT)))

    # ---- record the final chain slot and land the result tapes ----
    record(st, st["cur"] == C - 1)
    len_ref[0] = jnp.concatenate([r[...] for r in lens_refs], axis=0)
    errs = [r[...] for r in errs_refs]
    if debug_rounds:
        errs[0] = st["rounds"]
    err_ref[0] = jnp.concatenate(errs, axis=0)

    # ---- drain: transfer every remaining (incl. partial) frame ----
    def drain(i, c):
        st, stag = c
        hb = st["hb"]
        fl = fl_ref[...]
        hbr = hb >> 2
        nfl = jnp.maximum(((hbr - fl) >> fhlog) << fhlog, 0)
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


@functools.partial(jax.jit,
                   static_argnames=("out_size", "chain", "sr", "unroll",
                                    "interpret", "sort", "transfers",
                                    "debug_rounds"))
def decompress_blocks_lockstep_v9(comp, comp_len, out_size: int,
                                  chain: int = 4,
                                  sr: int = 512, unroll: int = 6,
                                  interpret: bool = False,
                                  sort: bool = True,
                                  sort_key=None,
                                  transfers: int = 2,
                                  debug_rounds: bool = False):
    """Decode a batch of independent LZ4 blocks, `chain` blocks per lane.

    Same per-block contract as decompress_blocks_lockstep_v7: comp uint8
    [B, slot] zero-padded, comp_len int32 [B], static out_size ->
    (out uint8 [B, out_size], out_len int32 [B], err bool [B]); err
    mirrors golden.decompress (lz4e_decompress.c:62-460 semantics).

    sort/sort_key: snake-deal the cost-sorted blocks across lanes so
    per-lane chain totals balance (the makespan objective — see module
    docstring). sort=False deals blocks in input order (tests).
    """
    # chained output bases must stay hot-ring/frame/flush-band aligned
    assert out_size % max(HSPAN, 4 * FBAND) == 0, \
        "chained decode needs out_size aligned to the hot/flush bands"
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    C = chain
    while sr > 2 * HOT and sr * 4 > 2 * max(out_size, 8 * HOT):
        sr //= 2
    out_cap = out_size
    SLOT4 = -(-slot // 4) * 4
    span = LANES * C
    ng = -(-nb // span)
    pad = ng * span - nb
    if pad:
        comp = jnp.pad(comp, ((0, pad), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, pad), constant_values=1)
        comp = comp.at[nb:, 0].set(0)
    n = ng * span
    # defensive zero of slot tails (the machine's pad contract)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, slot), 1)
    comp = jnp.where(pos < comp_len[:, None], comp, 0)
    if SLOT4 != slot:
        comp = jnp.pad(comp, ((0, 0), (0, SLOT4 - slot)))

    # snake deal: sort by cost desc, row j of [C, cols] reversed on odd
    # j, columns become lanes -> per-lane totals balance
    if sort:
        key = comp_len if sort_key is None else \
            jnp.asarray(sort_key, jnp.int32)
        if sort_key is not None and pad:
            key = jnp.pad(key, (0, pad))
        order = jnp.argsort(-key)
    else:
        order = jnp.arange(n, dtype=jnp.int32)
    mat = order.reshape(C, ng * LANES)
    mat = mat.at[1::2].set(mat[1::2, ::-1])
    perm = mat.T                                   # [cols, C] block ids
    flat = perm.reshape(-1)
    inv = jnp.argsort(flat)

    cols = comp[perm]                              # [cols, C, SLOT4]
    cols = cols.reshape(ng, LANES, C * SLOT4)
    clens = comp_len[perm].reshape(ng, LANES, C).transpose(0, 2, 1)
    tapes = jax.vmap(lambda u8: LK.pack_tapes(
        u8, jnp.full((LANES,), C * SLOT4, jnp.int32)))(cols)
    cr = tapes.shape[1]
    if cr % BAND:
        tapes = jnp.pad(tapes, ((0, 0), (0, BAND - cr % BAND), (0, 0)))
        cr = tapes.shape[1]
    orr = C * out_cap // 4

    LWU = 1 << (LW * unroll - 1).bit_length()
    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, C=C, OUT_SIZE=out_size, SLOT4=SLOT4,
                          CR=cr, OR=orr, sr=sr, unroll=unroll,
                          transfers=transfers, debug_rounds=debug_rounds),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, cr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, C, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, C, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, C, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, C, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, C, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LWU, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((CAPW, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),   # flush frontier rows
        ] + [pltpu.VMEM((1, LANES), jnp.int32)   # per-slot len/err rows
             for _ in range(2 * C)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tapes, clens)

    data = jax.vmap(LK.unpack_tapes)(out)          # [ng, LANES, C*out_cap]
    data = data.reshape(ng * LANES * C, out_cap)
    out_len = out_len.transpose(0, 2, 1).reshape(-1)
    err = err.transpose(0, 2, 1).reshape(-1)
    if debug_rounds:
        rounds = err.reshape(ng, LANES, C)[:, :, 0]
        return (data[inv][:nb, :out_size], out_len[inv][:nb], rounds)
    return (data[inv][:nb, :out_size], out_len[inv][:nb],
            err[inv][:nb].astype(bool))
