"""Lane-lockstep LZ4 decoder v5: group-interleaved rounds.

v4 advances 128 blocks per round (one per VPU lane). Its per-round cost
is dominated by FIXED vector-op overhead, not element throughput: a
(1,128) op costs ~0.8 ns/op-row-equivalent while a (512,128) op costs
~2.4 ns — 512x the data for 3x the cost (docs/Performance.md round-2
tables). v5 exploits that by interleaving G groups of 128 blocks into
every array's row dimension:

  * layout convention: word j of block (g, L) lives at row j*G + g of an
    interleaved (w*G, 128) window; per-block scalars are (G, 128);
  * the per-lane shift networks (rotate/funnel/place/extract) roll by
    multiples of G rows with per-(g,L) select masks, so each of the
    G*128 blocks shifts by its own amount while groups stay in their
    row classes;
  * the comp and out tapes are interleaved the same way, so window
    commits are single contiguous stores and the banded far scan
    services all G groups in one walk;
  * the state machine itself is the v4 machine run on (G,128) arrays —
    one round advances up to G*128 sequences.

The banded scans clamp idle lanes into the live span (far reads clamp
non-far lanes to the far minimum; refills clamp DONE lanes to the live
ip minimum) so walk cost tracks the lanes that actually read.

Error contract, output bytes, and per-block state transitions are
identical to lockstep.decode_tapes / golden.decompress
(lz4e_decompress.c:62-460 semantics).
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
    shift_right_u, shift_left_u,
)

LANES = LK.LANES
EW = 40            # parse window words exposed per round (160 B)
BANDW = 8          # words per banded-scan slab (slab rows = BANDW * G)
LW = 128           # local comp window words per unroll step (512 B)
RESERVE = 176      # per-step refill reserve (max bytes one sub-step consumes)
SMALL = 0x40000000   # plain int: a jnp scalar here would be captured as a
                     # constant by pallas kernel bodies


# ---------------------------------------------------------------------------
# G-interleaved window primitives
# ---------------------------------------------------------------------------


def _iota_words(w: int, G: int):
    """(w*G,128) int32: word index of each interleaved row."""
    return jax.lax.broadcasted_iota(jnp.int32, (w * G, LANES), 0) // G


def _bcg(v, w: int):
    """Tile per-block (G,128) values over an interleaved (w*G,128) window:
    row r gets v[r % G]. Bool inputs tile as int32 (Mosaic cannot
    concatenate i1 vregs) and convert back."""
    if v.dtype == jnp.bool_:
        return jnp.tile(v.astype(jnp.int32), (w, 1)) != 0
    return jnp.tile(v, (w, 1))


def rotate_up_g(win, s, size_w: int, G: int):
    """Per-block rotate UP by s words: word j+s -> word j (mod size_w)."""
    cur = win
    bit = 1
    while bit < size_w:
        rolled = jnp.roll(cur, (size_w - bit) * G, axis=0)
        cur = jnp.where(_bcg((s & bit) != 0, size_w), rolled, cur)
        bit <<= 1
    return cur


def rotate_down_g(win, s, size_w: int, G: int):
    cur = win
    bit = 1
    while bit < size_w:
        rolled = jnp.roll(cur, bit * G, axis=0)
        cur = jnp.where(_bcg((s & bit) != 0, size_w), rolled, cur)
        bit <<= 1
    return cur


def byteshift_up_g(win, t, G: int):
    """Byte stream UP by t bytes (t (G,128) in [0,4))."""
    w = win.shape[0] // G
    nxt = jnp.concatenate([win[G:], jnp.zeros((G, LANES), jnp.int32)],
                          axis=0)
    tb = _bcg(t * 8, w)
    return jnp.where(_bcg(t == 0, w), win,
                     shift_right_u(win, tb) | shift_left_u(nxt, 32 - tb))


def byteshift_down_g(win, t, G: int):
    w = win.shape[0] // G
    prev = jnp.concatenate([jnp.zeros((G, LANES), jnp.int32), win[:-G]],
                           axis=0)
    tb = _bcg(t * 8, w)
    return jnp.where(_bcg(t == 0, w), win,
                     shift_left_u(win, tb) | shift_right_u(prev, 32 - tb))


def funnel_g(win, t, w_out: int, G: int):
    """(w_out*G,128) byte-aligned window starting at byte t of win."""
    W = win.shape[0] // G
    cur = rotate_up_g(win, t >> 2, W, G)
    return byteshift_up_g(cur, t & 3, G)[:w_out * G]


def byte_mask_g(w: int, b0, b1, G: int):
    """Interleaved (w*G,128) blend mask: 0xFF at byte positions [b0, b1)."""
    rows4 = _iota_words(w, G) * 4
    bm = jnp.zeros((w * G, LANES), jnp.int32)
    b0t = _bcg(b0, w)
    b1t = _bcg(b1, w)
    for k in range(4):
        inb = (rows4 + k >= b0t) & (rows4 + k < b1t)
        bm = bm | jnp.where(inb,
                            jnp.int32(np.int32(np.uint32(255) << (8 * k))), 0)
    return bm


def extract_rows_g(tape, w0, w: int, G: int):
    """Per-block word-window extract from an interleaved VALUE tape:
    out word i of (g,L) = tape word w0[g,L] + i; words outside read 0."""
    Rw = tape.shape[0] // G
    band = max(w, 64)
    while band & (band - 1):
        band += 1
    band = min(band, 1 << max(0, (Rw - 1)).bit_length())
    nb = -(-Rw // band)
    b_idx = w0 >> (band.bit_length() - 1)
    lo = jnp.zeros((band * G, LANES), jnp.int32)
    hi = jnp.zeros((band * G, LANES), jnp.int32)
    for b in range(nb):
        seg = tape[b * band * G:(b + 1) * band * G]
        if seg.shape[0] < band * G:
            seg = jnp.pad(seg, ((0, band * G - seg.shape[0]), (0, 0)))
        lo = jnp.where(_bcg(b_idx == b, band), seg, lo)
        hi = jnp.where(_bcg(b_idx == b - 1, band), seg, hi)
    win = jnp.concatenate([lo, hi], axis=0)
    s = w0 - b_idx * band
    out = rotate_up_g(win, s, 2 * band, G)[:w * G]
    absw = _bcg(w0, w) + _iota_words(w, G)
    return jnp.where((absw >= 0) & (absw < Rw), out, 0)


def extract_bytes_g(tape, bytepos, w: int, G: int):
    """Per-block byte-aligned window from an interleaved VALUE tape."""
    win = extract_rows_g(tape, bytepos >> 2, w + 1, G)
    return byteshift_up_g(win, bytepos & 3, G)[:w * G]


def place_g(stag, stream, dst_rel, k, G: int):
    """Blend stream bytes [0, k) into interleaved staging at per-block
    byte offset dst_rel (same contract as lockstep.place)."""
    SRw = stag.shape[0] // G
    Wp = stream.shape[0] // G
    fo = dst_rel & (FR * 4 - 1)
    f = dst_rel >> (2 + FR.bit_length() - 1)
    pad = jnp.concatenate(
        [stream, jnp.zeros(((2 * FR - Wp) * G, LANES), jnp.int32)], axis=0)
    df = byteshift_down_g(rotate_down_g(pad, fo >> 2, 2 * FR, G), fo & 3, G)
    bm = byte_mask_g(2 * FR, fo, fo + jnp.maximum(k, 0), G)
    dfm = df & bm
    nsl = SRw // FR
    vals = []
    msks = []
    for s in range(nsl):
        is_lo = _bcg(f == s, FR)
        is_hi = _bcg(f == s - 1, FR)
        vals.append(jnp.where(is_lo, dfm[:FR * G], 0)
                    | jnp.where(is_hi, dfm[FR * G:], 0))
        msks.append(jnp.where(is_lo, bm[:FR * G], 0)
                    | jnp.where(is_hi, bm[FR * G:], 0))
    sv = jnp.concatenate(vals, axis=0)
    sm = jnp.concatenate(msks, axis=0)
    return (stag & ~sm) | sv


def _sb_g(win, j: int, G: int):
    """Static byte j of an interleaved byte-aligned window, as (G,128)."""
    return (win[(j // 4) * G:(j // 4) * G + G] >> (8 * (j % 4))) & 255


def extract_rows_banded_g(ref, w0, w: int, Rw: int, G: int):
    """Per-block word window from an interleaved VMEM ref, scanning only
    live slabs: out word i of (g,L) = ref word w0[g,L]+i (same group).
    Walk cost scales with the cross-block word SPAN. Requires Rw % BANDW
    == 0 and ref rows == Rw * G."""
    assert Rw % BANDW == 0
    nslab = Rw // BANDW
    blog = BANDW.bit_length() - 1
    K = -(-(w + BANDW - 1) // BANDW)
    b_idx = w0 >> blog
    b_lo = jnp.min(b_idx)
    b_hi = jnp.max(b_idx) + K
    regs = [jnp.zeros((BANDW * G, LANES), jnp.int32) for _ in range(K)]

    def body(b, regs):
        bc = jnp.clip(b, 0, nslab - 1)
        slab = ref[0, pl.ds(bc * BANDW * G, BANDW * G), :]
        return tuple(
            jnp.where(_bcg(b_idx == b - k, BANDW), slab, regs[k])
            for k in range(K))

    regs = jax.lax.fori_loop(b_lo, b_hi, body, tuple(regs))
    win = jnp.concatenate(regs, axis=0)
    s = w0 - (b_idx << blog)
    out = rotate_up_g(win, s, K * BANDW, G)[:w * G]
    absw = _bcg(w0, w) + _iota_words(w, G)
    return jnp.where((absw >= 0) & (absw < Rw), out, 0)


def extract_bytes_banded_g(ref, bytepos, w: int, Rw: int, G: int):
    win = extract_rows_banded_g(ref, bytepos >> 2, w + 1, Rw, G)
    return byteshift_up_g(win, bytepos & 3, G)[:w * G]


def _lsic_scan(byte_list, live0):
    """LSIC 255-chain scan over (G,128) bytes (lockstep._lsic_scan with
    group-shaped operands)."""
    ext = jnp.zeros_like(byte_list[0])
    cons = jnp.zeros_like(byte_list[0])
    live = live0
    for bj in byte_list:
        ext = ext + jnp.where(live, bj, 0)
        cons = cons + live.astype(jnp.int32)
        live = live & (bj == 255)
    return ext, cons, live


# ---------------------------------------------------------------------------
# The round (v4 state machine on (G,128) state)
# ---------------------------------------------------------------------------


def _round(st, stag, loc_ref, locb_ref, scr_ref, comp_ref, out_ref,
           clen, olen, win_base, CRw: int, ORw: int, LWU: int, G: int,
           allow_far: bool = True, do_refill: bool = True):
    SRw = stag.shape[0] // G
    win_end = win_base + SRw * 4
    mode, ip, op = st["mode"], st["ip"], st["op"]
    lit, mlen, acc = st["lit"], st["mlen"], st["acc"]
    ml0, d = st["ml0"], st["d"]
    run = (mode < DONE) & (op < win_end)

    # ---- local comp window refill (amortized banded scan) ----
    if do_refill:
        U = LWU // LW
        t = ip - locb_ref[...]
        need = jnp.any(run & (t > LWU * 4 - U * RESERVE))
        live = mode < DONE
        ip_lo = jnp.min(jnp.where(live, ip, SMALL))
        ipc = jnp.where(live, ip, ip_lo)

        @pl.when(need)
        def _refill():
            loc_ref[...] = extract_bytes_banded_g(comp_ref, ipc, LWU, CRw, G)
            locb_ref[...] = ipc

    loc_b = locb_ref[...]
    t = ip - loc_b
    cw = funnel_g(loc_ref[...], t, EW, G)    # byte 0 == comp[ip]
    b = [_sb_g(cw, j, G) for j in range(LSIC_P + 2)]

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
    err_h = to_lit & ((ip > clen) | (ip + lit_new > clen)
                      | (op + lit_new > olen))
    mode = jnp.where(err_h, ERR,
                     jnp.where(to_llsic, LLSIC,
                               jnp.where(to_lit, LIT, mode)))
    lit = jnp.where(to_lit & ~err_h, lit_new, lit)

    # ---- phase L: literal range copy ----
    l_run = run & (mode == LIT)
    avail = EW * 4 - cons - 3
    k_l = jnp.clip(jnp.minimum(jnp.minimum(lit, win_end - op),
                               jnp.minimum(jnp.int32(CAP), avail)), 0)
    k_l = jnp.where(l_run, k_l, 0)
    lit_src = funnel_g(cw, cons, CAPW, G)
    stag = place_g(stag, lit_src, op - win_base, k_l, G)
    op = op + k_l
    ip = ip + k_l
    cons = cons + k_l
    lit = lit - k_l
    lit_done = l_run & (lit == 0)
    at_end = lit_done & (ip == clen)
    mode = jnp.where(at_end, DONE, jnp.where(lit_done, OFF, mode))

    # ---- phase O: offset + match-length header ----
    o_l = run & (mode == OFF)
    m_l = run & (mode == MLSIC)
    ow = funnel_g(cw, cons, 4, G)
    ob = [_sb_g(ow, j, G) for j in range(LSIC_P + 2)]
    o16 = ob[0] | (ob[1] << 8)
    err_o = o_l & ((ip + 2 > clen) | (o16 == 0) | (o16 > op))
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
    err_m = to_match & ((ip > clen) | (op + mlen_new > olen))
    mode = jnp.where(err_o | err_m, ERR,
                     jnp.where(to_mlsic, MLSIC,
                               jnp.where(to_match, MATCH, mode)))
    mlen = jnp.where(to_match & ~err_m, mlen_new, mlen)

    # ---- phase M: match range copy (doubling distance) ----
    m_run = run & (mode == MATCH)
    if not allow_far:
        m_run = m_run & (op - d >= win_base)
    k_m = jnp.clip(jnp.minimum(jnp.minimum(mlen, win_end - op),
                               jnp.minimum(jnp.int32(CAP), d)), 0)
    k_m = jnp.where(m_run, k_m, 0)
    src = jnp.where(m_run, op - d, op)
    s_stg = extract_bytes_g(stag, src - win_base, CAPW, G)
    if allow_far:
        is_far = m_run & (src < win_base)
        far = jnp.any(is_far)
        far_lo = jnp.min(jnp.where(is_far, src, SMALL))
        scan_src = jnp.where(is_far, src, far_lo)
        scr_ref[...] = _bcg(src * 0, CAPW)

        @pl.when(far)
        def _far_read():
            scr_ref[...] = extract_bytes_banded_g(out_ref, scan_src,
                                                  CAPW, ORw, G)

        s_com = scr_ref[...]
        bnd = byte_mask_g(CAPW, jnp.zeros_like(src), win_base - src, G)
        msrc = (s_com & bnd) | (s_stg & ~bnd)
    else:
        msrc = s_stg
    stag = place_g(stag, msrc, op - win_base, k_m, G)
    op = op + k_m
    mlen = mlen - k_m
    d = jnp.where(m_run & (k_m == d) & (d < CAP), 2 * d, d)
    mode = jnp.where(m_run & (mlen == 0), TOK, mode)

    st2 = dict(mode=mode, ip=ip, op=op, lit=lit, mlen=mlen, acc=acc,
               ml0=ml0, d=d, rounds=st["rounds"] + 1)
    return st2, stag


def _kernel(comp_ref, clen_ref, olen_ref, out_ref, len_ref, err_ref,
            loc_ref, locb_ref, scr_ref, *, CRw: int, ORw: int, sr: int,
            G: int, unroll: int = 1, debug_rounds: bool = False):
    clen = clen_ref[0]                       # (G,128)
    olen = olen_ref[0]
    n_win = ORw // sr

    z = clen * 0
    st = dict(mode=z, ip=z, op=z, lit=z, mlen=z, acc=z, ml0=z, d=z,
              rounds=z)
    LWU = LW * unroll
    locb_ref[...] = z - LWU * 8
    max_rounds = jnp.int32(4 * (CRw + ORw) + 2048)

    def win_body(w, st):
        win_base = w * sr * 4

        def cond(c):
            st, _stag = c
            active = (st["mode"] < DONE) & (st["op"] < win_base + sr * 4)
            return jnp.any(active) & jnp.all(st["rounds"] < max_rounds)

        def body(c):
            st, stag = c
            for u in range(unroll):
                st, stag = _round(
                    st, stag, loc_ref, locb_ref, scr_ref, comp_ref,
                    out_ref, clen, olen, win_base, CRw, ORw, LWU, G,
                    allow_far=(u == 0), do_refill=(u == 0))
            return st, stag

        st, stag = jax.lax.while_loop(
            cond, body, (st, jnp.zeros((sr * G, LANES), jnp.int32)))
        out_ref[0, pl.ds(w * sr * G, sr * G), :] = stag
        return st

    st = jax.lax.fori_loop(0, n_win, win_body, st)
    err = (st["mode"] != DONE).astype(jnp.int32)
    len_ref[...] = jnp.where(err != 0, 0, st["op"])[None]
    err_ref[...] = (st["rounds"] if debug_rounds else err)[None]


def _pick_g(out_size: int, slot: int) -> int:
    """Largest G in {8,4,2,1} whose interleaved tapes fit the VMEM budget
    (comp + out + staging/windows, ~82 MB usable of the 100 MB limit)."""
    per_g = (-(-slot // 4) + -(-out_size // 4) + 4096) * 512
    g = 8
    while g > 1 and per_g * g > 82 * 1024 * 1024:
        g //= 2
    return g


@functools.partial(jax.jit,
                   static_argnames=("out_size", "sr", "unroll", "interpret",
                                    "sort", "G", "debug_rounds"))
def decompress_blocks_lockstep_v5(comp, comp_len, out_size: int,
                                  sr: int = 512, unroll: int = 2,
                                  interpret: bool = False,
                                  sort: bool = True, G: int = 0,
                                  debug_rounds: bool = False):
    """Decode a batch of independent LZ4 blocks (v5 interleaved engine).

    comp uint8 [B, slot] zero-padded, comp_len int32 [B], static out_size
    -> (out uint8 [B, out_size], out_len int32 [B], err bool [B]); err
    mirrors golden.decompress's DecodeError cases exactly
    (lz4e_decompress.c:62-460 semantics). G=0 autosizes the interleave
    factor to the VMEM budget.
    """
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    if G == 0:
        G = _pick_g(out_size, slot)
    while sr > FR and sr * 4 > max(out_size, 4 * FR):
        sr //= 2
    sr = max(sr, FR)       # place() frame grid and banded-scan alignment
    out_cap = -(-max(out_size, 1) // (4 * sr)) * (4 * sr)
    blk = LANES * G                          # blocks per grid cell
    ng = -(-nb // blk)
    pad = ng * blk - nb
    if pad:
        comp = jnp.pad(comp, ((0, pad), (0, 0)))
        comp_len = jnp.pad(comp_len, (0, pad), constant_values=1)
        comp = comp.at[nb:, 0].set(0)
    if sort and ng * G > 1:
        order = jnp.argsort(comp_len)
        inv = jnp.argsort(order)
        comp = comp[order]
        comp_len = comp_len[order]
    # (ng, G, LANES, slot): block (cell, g, L); pack each (LANES, slot)
    # group to a (CRw,128) word tape, then interleave the G tapes
    g8 = comp.reshape(ng * G, LANES, slot)
    gl = comp_len.reshape(ng * G, LANES)
    tapes = jax.vmap(LK.pack_tapes)(g8, gl)            # (ng*G, CRw, 128)
    crw = tapes.shape[1]
    if crw % BANDW:
        tapes = jnp.pad(tapes, ((0, 0), (0, BANDW - crw % BANDW), (0, 0)))
        crw = tapes.shape[1]
    # interleave: row j*G+g of cell tape = word j of group g
    tapes = (tapes.reshape(ng, G, crw, LANES)
             .transpose(0, 2, 1, 3)
             .reshape(ng, crw * G, LANES))
    orw = out_cap // 4
    olen = jnp.full((ng, G, LANES), out_size, jnp.int32)
    clen2 = gl.reshape(ng, G, LANES)

    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, CRw=crw, ORw=orw, sr=sr, G=G,
                          unroll=unroll, debug_rounds=debug_rounds),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, crw * G, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, G, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, G, LANES), lambda c: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orw * G, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, G, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, G, LANES), lambda c: (c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orw * G, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, G, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, G, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LW * unroll * G, LANES), jnp.int32),
            pltpu.VMEM((G, LANES), jnp.int32),
            pltpu.VMEM((CAPW * G, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tapes, clen2, olen)

    # de-interleave, then unpack word tapes to bytes
    out = (out.reshape(ng, orw, G, LANES)
           .transpose(0, 2, 1, 3)
           .reshape(ng * G, orw, LANES))
    data = jax.vmap(LK.unpack_tapes)(out)              # (ng*G, 128, cap)
    data = data.reshape(ng * blk, out_cap)
    out_len = out_len.reshape(-1)
    err = err.reshape(-1)
    if sort and ng * G > 1:
        data = data[inv]
        out_len = out_len[inv]
        err = err[inv]
    if debug_rounds:
        return data[:nb, :out_size], out_len[:nb], err[:nb]
    return (data[:nb, :out_size], out_len[:nb], err[:nb].astype(bool))
