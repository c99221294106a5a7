"""Vectorized LZ4 block parse/decode core: the round-2 TPU-native decoder.

The round-1 decoder ran one scalar-core loop per block (~240 cycles per
sequence, 0.06 GB/s). This module rebuilds decode as data-parallel phases
over *transposed* byte arrays of shape (128, NSEG): element [o, k] is the
byte at stream position p = k*128 + o, i.e. one lane column = one 128-byte
**segment** and the sublane row = position within the segment. All parse
lookups are then column-aligned masked reduces — no dynamic lane indexing
(unsupported on this Mosaic toolchain, docs/Performance.md).

Phases:

1. **LSIC scans** (`lsic_scans`): per-position 0xFF-run length and
   first-non-255 value by log-doubling with static byte shifts. Every
   position's LSIC extension value (lz4e_decompress.c:194-220) in
   O(log) passes, for all positions at once.
2. **Hop tables** (`build_hops`): speculative parse — for a hypothetical
   token at every position p, the next parse state and the output bytes
   produced. Short-literal tokens (lit run < 15) resolve their entire
   sequence (offset, match len incl. LSIC) from bounded shifted reads;
   long-literal tokens hop through an offset-phase state that carries the
   token's 4-bit ml0 packed in the state word.
3. **Windowed exit sweep** (`segment_sweep`): for every state, follow
   hops while they stay within the next W bytes of the same segment;
   record the first state beyond (the "exit"), plus output-bytes and
   sequence-count along the way. A 128-step backward recurrence, fully
   unrolled, each step touching only a (W, NSEG) slab.
4. **Chain walk** (scalar, SMEM in-kernel / numpy in tests): ~NSEG hops
   through the exit table resolve the true chain's per-segment entry
   states from position 0.
5. **Re-walk** (`rewalk`): column-parallel re-execution of each segment's
   chain from its entry state, emitting the per-sequence table
   (lit_src, lit_len, offset, match_len) in block order.

State word: bits 0 = phase (0 token / 1 offset), 1..18 = position,
20..23 = ml0 (offset phase only). Aggregate word: bits 0..7 = sequence
count, 8..31 = output bytes.

The phases are pure static-shape jnp so the same code runs under CPU jit
(parity tests against a numpy reference parser) and inside the Pallas
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ... import format as F

LANES = 128
_LSIC_LOG = 9          # resolves 0xFF runs to 512 (beyond any 64 KiB block)
_W = 24                # sweep composition window (bytes ahead, same segment)
_PH_OFF = 1
_POS_SHIFT = 1
_ML_SHIFT = 20
_CNT_BITS = 8          # aggregate word: low 8 bits seq count, rest out bytes

# TPU MXU default f32 matmul precision is ONE bf16 pass: exact only for
# integer values < 2^8. Dots that move positions/lengths (up to 2^17) must
# run at HIGHEST (multi-pass, f32-exact for ints < 2^24). Byte-value
# gathers (values <= 255) stay at default/full MXU rate.
_EXACT = jax.lax.Precision.HIGHEST


def _tshift(arr, d: int):
    """y[o, k] = arr at position p + d (transposed layout, zero fill past
    the end; static d >= 0)."""
    if d == 0:
        return arr
    nseg = arr.shape[1]
    dc, dl = d // LANES, d % LANES
    a = jnp.roll(arr, -dc, axis=1)
    if dl == 0:
        out = a
    else:
        b = jnp.roll(arr, -(dc + 1), axis=1)
        ar = jnp.roll(a, -dl, axis=0)
        br = jnp.roll(b, -dl, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
        out = jnp.where(row < LANES - dl, ar, br)
    col = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    # exact zero fill: position p+d >= nseg*128 reads 0
    if dl == 0:
        return jnp.where(col < nseg - dc, out, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    p_plus = col * LANES + row + d
    return jnp.where(p_plus < nseg * LANES, out, 0)


def _pos_grid(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return col * LANES + row


def lsic_scans(b):
    """runff[p] = length of the 0xFF run starting at p (clamped to 512);
    fnz[p] = first byte value < 255 at or after p. The LSIC chain at p has
    value 255*runff[p] + fnz[p] and consumes runff[p] + 1 bytes."""
    is_ff = (b == 255).astype(jnp.int32)
    run = is_ff
    for k in range(_LSIC_LOG):
        step = 1 << k
        run = jnp.where(run == step, step + _tshift(run, step), run)
    fnz = jnp.where(is_ff == 1, -1, b)
    for k in range(_LSIC_LOG):
        step = 1 << k
        fnz = jnp.where(fnz < 0, _tshift(fnz, step), fnz)
    return run, jnp.maximum(fnz, 0)


def build_hops(b, clen):
    """Speculative per-position parse tables (all (128, NSEG) int32).

    Keys:
      hop_tok:  state word of the next state if a token is at p
      agg_tok:  aggregate word (out bytes << 8 | seq count 1)
      litpack:  lit_src_rel (bits 0..9) | short flag (bit 10) |
                terminal flag (bit 11) | overrun flag (bit 12)
      lit_len:  literal run length
      off_tok:  LE16 offset (valid for short tokens)
      mlen_tok: full match length (valid for short tokens)
      hop_off_n / hop_off_x: next-state word from an offset-phase state
                (token ml0 < 15 / == 15)
      mext_off: match LSIC extension value read at p + 2
      off16:    LE16 at p (read by the re-walk at offset states)

    Every position is clamped so reads stay in-array; chains that overrun
    clen land on position clen + 1 (the malformed marker). A terminal
    token (literals end exactly at clen) lands on position clen, phase 0.
    """
    pos = _pos_grid(b.shape)
    runff, fnz = lsic_scans(b)

    def run_at(d):
        return _tshift(runff, d)

    def fnz_at(d):
        return _tshift(fnz, d)

    tok = b
    ll0 = tok >> 4
    ml0 = tok & 15
    has_llx = ll0 == 15
    r1, f1 = run_at(1), fnz_at(1)
    llx_bytes = jnp.where(has_llx, r1 + 1, 0)
    llx_val = jnp.where(has_llx, 255 * r1 + f1, 0)
    lit_len = ll0 + llx_val
    lit_src = 1 + llx_bytes                   # relative to p
    lit_end = lit_src + lit_len               # offset position, rel. to p

    off16 = b | (_tshift(b, 1) << 8)

    # short tokens (ll0 < 15): offset at p+1+ll0, match LSIC at p+3+ll0
    off_sel = jnp.zeros_like(b)
    mxb_sel = jnp.zeros_like(b)
    mxv_sel = jnp.zeros_like(b)
    for d in range(15):
        m = ll0 == d
        off_sel = jnp.where(m, _tshift(off16, 1 + d), off_sel)
        mxb_sel = jnp.where(m, run_at(3 + d) + 1, mxb_sel)
        mxv_sel = jnp.where(m, 255 * run_at(3 + d) + fnz_at(3 + d), mxv_sel)

    short = ll0 < 15
    has_mlx = ml0 == 15
    mlen_short = F.MINMATCH + ml0 + jnp.where(has_mlx, mxv_sel, 0)
    adv_short = lit_end + 2 + jnp.where(has_mlx, mxb_sel, 0)

    terminal = (pos + lit_end) == clen
    overrun = (pos + lit_end) > clen

    # next-state words
    next_tok_pos = jnp.minimum(pos + adv_short, clen + 1)
    # a non-terminal sequence whose next token would start at clen is
    # malformed (the last sequence must be literal-only)
    next_tok_pos = jnp.where(next_tok_pos == clen, clen + 1, next_tok_pos)
    hop_short = next_tok_pos << _POS_SHIFT
    q_pos = jnp.minimum(pos + lit_end, clen + 1)
    hop_long = ((q_pos << _POS_SHIFT) | _PH_OFF) | (ml0 << _ML_SHIFT)
    hop_done = clen << _POS_SHIFT
    hop_bad = (clen + 1) << _POS_SHIFT

    hop_tok = jnp.where(
        terminal, hop_done,
        jnp.where(overrun, hop_bad,
                  jnp.where(short, hop_short, hop_long)))
    out_tok = jnp.where(short & ~terminal & ~overrun,
                        lit_len + mlen_short, lit_len)
    agg_tok = (out_tok << _CNT_BITS) | 1

    litpack = (jnp.minimum(lit_src, 1023)
               | (short.astype(jnp.int32) << 10)
               | (terminal.astype(jnp.int32) << 11)
               | (overrun.astype(jnp.int32) << 12))

    # offset-phase states (long-literal tokens): bytes p, p+1 = offset;
    # the carried ml0 selects the variant at composition time
    r2, f2 = run_at(2), fnz_at(2)
    nn = jnp.minimum(pos + 2, clen + 1)
    nn = jnp.where(nn == clen, clen + 1, nn)
    nx = jnp.minimum(pos + 2 + r2 + 1, clen + 1)
    nx = jnp.where(nx == clen, clen + 1, nx)
    hop_off_n = nn << _POS_SHIFT
    hop_off_x = nx << _POS_SHIFT
    mext_off = 255 * r2 + f2

    return dict(hop_tok=hop_tok, agg_tok=agg_tok, litpack=litpack,
                lit_len=lit_len, off_tok=off_sel, mlen_tok=mlen_short,
                hop_off_n=hop_off_n, hop_off_x=hop_off_x,
                mext_off=mext_off, off16=off16)


def _unpack_pos(word):
    return (word >> _POS_SHIFT) & 0x3FFFF


def _unpack_ml(word):
    return (word >> _ML_SHIFT) & 15


def segment_sweep(hops, clen):
    """Windowed exit tables.

    For every state s (token at [o,k], or offset-phase at [o,k]): follow
    hops while each lands within (o, o+W] bytes in the same segment and
    before clen; the exit is the first state beyond. Returns packed
    (state_word, agg_word) pairs for the three variants:

      e_tok:   exits from token states
      e_off_n: exits from offset states whose token had ml0 < 15,
               EXCLUDING the ml0 + MINMATCH output term (the composer —
               sweep, walk, or re-walk — adds it from the state's ml bits)
      e_off_x: same for ml0 == 15, INCLUDING the position-dependent
               match-LSIC extension value

    Implemented as a fully unrolled backward recurrence over rows 127..0:
    when row o is processed, every row in (o, o+W] is already final.
    """
    hop_tok, agg_tok = hops["hop_tok"], hops["agg_tok"]
    hop_off_n, hop_off_x = hops["hop_off_n"], hops["hop_off_x"]
    mext_off = hops["mext_off"]
    shape = hop_tok.shape
    nseg = shape[1]
    colbase = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1) * LANES

    ea_tok = hop_tok
    eb_tok = agg_tok
    ea_off_n = hop_off_n
    eb_off_n = jnp.zeros_like(hop_off_n)
    ea_off_x = hop_off_x
    eb_off_x = mext_off << _CNT_BITS

    def compose(first_a, first_b, o, tabs):
        """Compose one-hop (first_a, first_b) rows at sublane o with the
        final exit tables where the hop lands within the window."""
        (ta_tok, tb_tok, ta_on, tb_on, ta_ox, tb_ox) = tabs
        tpos = _unpack_pos(first_a)
        trel = tpos - colbase          # (1, nseg) target row if in-segment
        internal = (trel > o) & (trel <= o + _W) & (trel < LANES) \
            & (tpos < clen)
        w = min(_W, LANES - 1 - o)
        if w <= 0:
            return first_a, first_b
        rows = jax.lax.broadcasted_iota(jnp.int32, (w, nseg), 0) + o + 1
        mask = (rows == trel).astype(jnp.int32)   # (w, nseg)

        def lk(tbl):
            return jnp.sum(tbl[o + 1:o + 1 + w, :] * mask, axis=0,
                           keepdims=True)

        tphase = first_a & 1
        tml = _unpack_ml(first_a)
        is_x = tml == 15
        cont_a = jnp.where(
            tphase == 0, lk(ta_tok),
            jnp.where(is_x, lk(ta_ox), lk(ta_on)))
        cont_b = jnp.where(
            tphase == 0, lk(tb_tok),
            jnp.where(is_x, lk(tb_ox), lk(tb_on)))
        # offset-phase targets add their ml0 + MINMATCH output term here
        base = jnp.where(tphase == 1, (tml + F.MINMATCH) << _CNT_BITS, 0)
        a = jnp.where(internal, cont_a, first_a)
        b = first_b + jnp.where(internal, cont_b + base, 0)
        return a, b

    for o in range(LANES - 1, -1, -1):
        tabs = (ea_tok, eb_tok, ea_off_n, eb_off_n, ea_off_x, eb_off_x)
        a, bb = compose(hop_tok[o:o + 1, :], agg_tok[o:o + 1, :], o, tabs)
        ea_tok = ea_tok.at[o:o + 1, :].set(a)
        eb_tok = eb_tok.at[o:o + 1, :].set(bb)
        a, bb = compose(hop_off_n[o:o + 1, :],
                        jnp.zeros((1, nseg), jnp.int32), o, tabs)
        ea_off_n = ea_off_n.at[o:o + 1, :].set(a)
        eb_off_n = eb_off_n.at[o:o + 1, :].set(bb)
        a, bb = compose(hop_off_x[o:o + 1, :],
                        (mext_off[o:o + 1, :]) << _CNT_BITS, o, tabs)
        ea_off_x = ea_off_x.at[o:o + 1, :].set(a)
        eb_off_x = eb_off_x.at[o:o + 1, :].set(bb)

    return dict(ea_tok=ea_tok, eb_tok=eb_tok,
                ea_off_n=ea_off_n, eb_off_n=eb_off_n,
                ea_off_x=ea_off_x, eb_off_x=eb_off_x)


MAXSTEP = 44  # sequence-record slots per 128-byte segment: a sequence
# consumes >= 3 input bytes (token + LE16 offset), so a segment holds at
# most ceil(128/3) = 43 token starts — every legal stream fits


def rewalk(hops, entry_state, clen):
    """Column-parallel re-execution: from each segment's entry state,
    follow raw hops while they stay in the segment, recording one row per
    *sequence* (not per state: offset-phase visits merge into their
    token's record via a per-column record counter).

    entry_state: (1, NSEG) int32 state words, -1 where no chain state
    starts in the segment.

    Returns dict of (MAXSTEP, NSEG) int32 record arrays:
      r_lit_src: absolute comp position of the first literal byte
      r_lit_len: literal run length
      r_off:     match offset (0 for the terminal literal-only sequence)
      r_mlen:    match length (0 for terminal)
      r_live:    1 where the slot holds a sequence
    plus (1, NSEG) vectors:
      n_rec:     live records per column
      cont_off / cont_mlen / cont_valid: continuation fields for a
                 sequence whose token sat in the PREVIOUS column (its
                 offset state crossed the segment boundary); the caller
                 merges these into the previous column's last record
      err:       per-column malformed/overflow flag
    """
    hop_tok, litpack = hops["hop_tok"], hops["litpack"]
    lit_len_t, off_tok = hops["lit_len"], hops["off_tok"]
    mlen_tok = hops["mlen_tok"]
    hop_off_n, hop_off_x = hops["hop_off_n"], hops["hop_off_x"]
    mext_off, off16 = hops["mext_off"], hops["off16"]

    shape = hop_tok.shape
    nseg = shape[1]
    colbase = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1) * LANES
    rowg = jax.lax.broadcasted_iota(jnp.int32, (MAXSTEP, nseg), 0)

    z = jnp.zeros((MAXSTEP, nseg), jnp.int32)
    zv = jnp.zeros((1, nseg), jnp.int32)

    def lookup(tbl, o, active):
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        m = ((rows == o) & (active != 0)).astype(jnp.int32)
        return jnp.sum(tbl * m, axis=0, keepdims=True)

    def body(carry):
        (s, nrec, recs, cont, err, it) = carry
        (r_ls, r_ll, r_off, r_ml, r_live) = recs
        (c_off, c_ml, c_valid) = cont
        pos = _unpack_pos(s)
        in_col = (pos >= colbase) & (pos < colbase + LANES)
        active = ((s >= 0) & (pos < clen) & in_col).astype(jnp.int32)
        o = jnp.where(active != 0, pos - colbase, 0)
        phase = s & 1
        is_tok = (active != 0) & (phase == 0)
        is_off = (active != 0) & (phase == 1)

        # token-state fields
        a_tok = is_tok.astype(jnp.int32)
        hop_t = lookup(hop_tok, o, a_tok)
        lp = lookup(litpack, o, a_tok)
        ll = lookup(lit_len_t, o, a_tok)
        ot = lookup(off_tok, o, a_tok)
        mt = lookup(mlen_tok, o, a_tok)
        short = (lp >> 10) & 1
        term = (lp >> 11) & 1
        over = (lp >> 12) & 1
        lsrc = pos + (lp & 1023)

        # offset-state fields
        a_off = is_off.astype(jnp.int32)
        ml0 = _unpack_ml(s)
        hop_n = lookup(hop_off_n, o, a_off)
        hop_x = lookup(hop_off_x, o, a_off)
        mx = lookup(mext_off, o, a_off)
        o16 = lookup(off16, o, a_off)
        off_full = o16
        mlen_full = F.MINMATCH + ml0 + jnp.where(ml0 == 15, mx, 0)

        # --- record ---
        # token: write a new record at row nrec
        wt = (rowg == nrec) & is_tok
        r_ls = jnp.where(wt, lsrc, r_ls)
        r_ll = jnp.where(wt, ll, r_ll)
        seq_ok = (short == 1) & (term == 0) & (over == 0)
        r_off = jnp.where(wt, jnp.where(seq_ok, ot, 0), r_off)
        r_ml = jnp.where(wt, jnp.where(seq_ok, mt, 0), r_ml)
        r_live = jnp.where(wt, 1, r_live)
        # offset state with nrec > 0: merge into this column's previous
        # record; nrec == 0: the token was in the previous column —
        # export as continuation
        wo = (rowg == nrec - 1) & is_off & (nrec > 0)
        r_off = jnp.where(wo, off_full, r_off)
        r_ml = jnp.where(wo, mlen_full, r_ml)
        first_off = is_off & (nrec == 0)
        c_off = jnp.where(first_off, off_full, c_off)
        c_ml = jnp.where(first_off, mlen_full, c_ml)
        c_valid = jnp.where(first_off, 1, c_valid)

        nrec = nrec + jnp.where(is_tok, 1, 0)
        err = err | jnp.where((active != 0) & (over == 1), 1, 0) \
            | jnp.where(is_tok & (nrec > MAXSTEP), 1, 0)

        s_next = jnp.where(
            is_tok, hop_t,
            jnp.where(is_off, jnp.where(ml0 == 15, hop_x, hop_n), -1))
        s = jnp.where(active != 0, s_next, -1)
        recs = (r_ls, r_ll, r_off, r_ml, r_live)
        return (s, nrec, recs, (c_off, c_ml, c_valid), err, it + 1)

    def cond(carry):
        s = carry[0]
        it = carry[5]
        pos = _unpack_pos(s)
        in_col = (pos >= colbase) & (pos < colbase + LANES)
        any_active = jnp.any((s >= 0) & (pos < clen) & in_col)
        return any_active & (it < 2 * MAXSTEP + 4)

    init = (entry_state, zv, (z, z, z, z, z), (zv, zv, zv), zv, 0)
    (s, nrec, recs, cont, err, _it) = jax.lax.while_loop(cond, body, init)
    r_ls, r_ll, r_off, r_ml, r_live = recs
    c_off, c_ml, c_valid = cont

    # merge cross-column continuations into the owning token's record: the
    # token of a continuation in column k is the LAST record of the nearest
    # previous column with any records (every column in between is empty —
    # it was covered by the literal run). Right-to-left pass/block/value
    # scan by lane-roll doubling: a receiving column takes the first
    # continuation to its right with no recording column in between.
    PASS, BLOCK, VALUE = 0, 1, 2
    kind = jnp.where(c_valid != 0, VALUE,
                     jnp.where(nrec > 0, BLOCK, PASS))
    v_off, v_ml = c_off, c_ml
    nseg_ = r_ls.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nseg_), 1)
    # shift left by one first: receiver looks at its right neighbor onward
    def shl(x, s):
        y = jnp.roll(x, -s, axis=1)
        return jnp.where(col < nseg_ - s, y, PASS * jnp.ones_like(y))

    kind_r, off_r, ml_r = shl(kind, 1), shl(v_off, 1), shl(v_ml, 1)
    s = 1
    while s < nseg_:
        k2, o2, m2 = shl(kind_r, s), shl(off_r, s), shl(ml_r, s)
        take = kind_r == PASS
        kind_r = jnp.where(take, k2, kind_r)
        off_r = jnp.where(take, o2, off_r)
        ml_r = jnp.where(take, m2, ml_r)
        s *= 2
    wm = (rowg == nrec - 1) & (kind_r == VALUE) & (nrec > 0)
    r_off = jnp.where(wm, off_r, r_off)
    r_ml = jnp.where(wm, ml_r, r_ml)

    return dict(r_lit_src=r_ls, r_lit_len=r_ll, r_off=r_off, r_mlen=r_ml,
                r_live=r_live, n_rec=nrec, err=err)


def walk_chain_np(exits, clen: int, nseg: int):
    """Numpy reference of the in-kernel scalar chain walk.

    From state 0 (token at position 0), repeatedly apply the exit tables
    until position >= clen. Returns (entry_state per segment int64 array
    (-1 = no chain state starts in that segment), ok flag). The entry of
    segment k is the first chain state with position in [k*128, k*128+128).
    """
    ea_tok = np.asarray(exits["ea_tok"])
    ea_off_n = np.asarray(exits["ea_off_n"])
    ea_off_x = np.asarray(exits["ea_off_x"])
    entries = np.full(nseg, -1, np.int64)
    s = 0  # state word: position 0, phase 0
    guard = 0
    max_hops = nseg * (LANES // 2) + 16
    while True:
        pos = (s >> _POS_SHIFT) & 0x3FFFF
        if pos >= clen:
            ok = pos == clen and (s & 1) == 0
            return entries, ok
        seg, o = pos // LANES, pos % LANES
        if seg >= nseg:
            return entries, False
        if entries[seg] < 0:
            entries[seg] = s
        if s & 1:
            tbl = ea_off_x if ((s >> _ML_SHIFT) & 15) == 15 else ea_off_n
        else:
            tbl = ea_tok
        s = int(tbl[o, seg])
        guard += 1
        if guard > max_hops:
            return entries, False


# ---------------------------------------------------------------------------
# Execution phase: sequence table -> output bytes
# ---------------------------------------------------------------------------

STEP_PAD = 48    # MAXSTEP padded for matmul shapes
FAR_RANKS = 40   # descriptor slots for distinct "far" match windows per
# out row; a 128-byte row is covered by at most 33 sequences (>= 4 output
# bytes each), so no legal stream overflows this
FAR_CHUNK = 8    # far ranks gathered per fixed-point round (rank cycling)
LOCAL_MAX = 256  # root distances below this resolve via the delta scan


def _tri_excl(n):
    """Strictly-lower-triangular ones (n, n) f32: L @ x = exclusive cumsum
    along axis 0 (jnp.cumsum does not lower inside Mosaic kernels)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (c < r).astype(jnp.float32)


def _tshift_back(arr, d: int):
    """y[o, k] = arr at position p - d (transposed layout, zero fill
    before the start; static d >= 0)."""
    if d == 0:
        return arr
    dc, dl = d // LANES, d % LANES
    a = jnp.roll(arr, dc, axis=1)
    if dl == 0:
        out = a
    else:
        b = jnp.roll(arr, dc + 1, axis=1)
        ar = jnp.roll(a, dl, axis=0)
        br = jnp.roll(b, dl, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
        out = jnp.where(row >= dl, ar, br)
    pos = _pos_grid(arr.shape)
    return jnp.where(pos >= d, out, 0)


def _tshift_back_dyn(arr, d):
    """_tshift_back with a traced distance d >= 0."""
    dc, dl = d // LANES, d % LANES
    a = jnp.roll(arr, dc, axis=1)
    b = jnp.roll(arr, dc + 1, axis=1)
    ar = jnp.roll(a, dl, axis=0)
    br = jnp.roll(b, dl, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    out = jnp.where(row >= dl, ar, br)
    pos = _pos_grid(arr.shape)
    return jnp.where(pos >= d, out, 0)


def seq_layout(recs):
    """Output-position assembly over the (MAXSTEP, NSEG) record slots:
    out_start (STEP_PAD, NSEG), col_base (1, NSEG), total_out scalar."""
    nseg = recs["r_lit_len"].shape[1]
    olen = recs["r_lit_len"] + recs["r_mlen"]
    olen = jnp.pad(olen, ((0, STEP_PAD - MAXSTEP), (0, 0)))
    col_total = jnp.sum(olen, axis=0, keepdims=True)
    cu = jnp.transpose(_tri_excl(nseg), (1, 0))
    col_base = jnp.dot(col_total.astype(jnp.float32), cu,
                       precision=_EXACT,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
    within = jnp.dot(_tri_excl(STEP_PAD), olen.astype(jnp.float32),
                     precision=_EXACT,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    out_start = col_base + within
    total_out = jnp.sum(col_total) * 0 + (
        col_base[0, nseg - 1] + col_total[0, nseg - 1])
    return out_start, col_base, total_out


def _window_select(win, w):
    """out[r, l] = win[r, w[r, l]] for w in [0, 256) (win (R, 256))."""
    out = jnp.zeros(w.shape, jnp.int32)
    for t in range(256):
        out = jnp.where(w == t, win[:, t:t + 1], out)
    return out


def classify(recs, out_rows: int):
    """Per-byte classification from the sequence table.

    Returns per-byte maps (out_rows, 128): is_lit, lit_src (absolute comp
    position of each literal byte), local (match with root distance <
    LOCAL_MAX), dloc (that distance), far + frank (window rank), plus
    w_delta (out_rows, FAR_RANKS) far-window distances, total_out and the
    combined err flag.
    """
    nseg = recs["r_lit_len"].shape[1]
    out_start, col_base, total_out = seq_layout(recs)

    def padT(x):
        return jnp.transpose(jnp.pad(x, ((0, STEP_PAD - MAXSTEP), (0, 0))),
                             (1, 0))

    slabs = {}
    fields = dict(start=jnp.transpose(out_start, (1, 0)),
                  litlen=padT(recs["r_lit_len"]),
                  litsrc=padT(recs["r_lit_src"]),
                  off=padT(recs["r_off"]),
                  mlen=padT(recs["r_mlen"]),
                  live=padT(recs["r_live"]))

    rowstart = (jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)
                * LANES)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_rows, nseg), 1)
    # columns with no records are skipped entirely: a long literal/match
    # spanning whole segments leaves empty columns whose out range is
    # zero-width. The slab takes the covering non-empty column and the
    # NEXT non-empty one; coverage beyond that (3+ sequence-bearing
    # columns in one out row) flags the hazard via non-empty ordinals.
    nonempty = (recs["n_rec"] > 0)                      # (1, NSEG)
    maskA = (col_base <= rowstart) & nonempty
    k_r = jnp.max(jnp.where(maskA, cols, -1), axis=1, keepdims=True)
    k_r = jnp.clip(k_r, 0, nseg - 1)
    k2 = jnp.min(jnp.where((cols > k_r) & nonempty, cols, nseg - 1),
                 axis=1, keepdims=True)
    ohA = (cols == k_r).astype(jnp.float32)
    ohB = (cols == k2).astype(jnp.float32)
    for name, fT in fields.items():
        f = fT.astype(jnp.float32)
        a = jnp.dot(ohA, f, precision=_EXACT,
                    preferred_element_type=jnp.float32)
        b = jnp.dot(ohB, f, precision=_EXACT,
                    preferred_element_type=jnp.float32)
        slabs[name] = jnp.concatenate([a, b], axis=1).astype(jnp.int32)

    rowend = rowstart + LANES - 1
    ordA = jnp.sum((maskA).astype(jnp.int32), axis=1, keepdims=True)
    ordE = jnp.sum(((col_base <= rowend) & nonempty).astype(jnp.int32),
                   axis=1, keepdims=True)
    hazard = ((ordE > ordA + 1) & (rowstart < total_out)).astype(jnp.int32)

    j_abs = rowstart + jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, LANES), 1)
    zb = jnp.zeros((out_rows, LANES), jnp.int32)
    sel_litend, sel_delta, sel_m0, sel_off = zb, zb, zb, zb
    sel_rank = jnp.full((out_rows, LANES), -1, jnp.int32)
    far_cnt = jnp.zeros((out_rows, 1), jnp.int32)
    far_over = jnp.zeros((out_rows, 1), jnp.int32)
    w_delta = jnp.zeros((out_rows, FAR_RANKS), jnp.int32)
    rank_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_rows, FAR_RANKS), 1)

    for c in range(2 * STEP_PAD):
        st = slabs["start"][:, c:c + 1]
        ll = slabs["litlen"][:, c:c + 1]
        ml = slabs["mlen"][:, c:c + 1]
        lv = slabs["live"][:, c:c + 1]
        offc = jnp.maximum(slabs["off"][:, c:c + 1], 1)
        litend = st + ll
        seqend = litend + ml
        m0 = litend - offc
        covers = (lv != 0) & (st < rowstart + LANES) & (seqend > rowstart)
        # far = any byte of this (row, cand) has root distance >= LOCAL_MAX;
        # the largest root distance in the row is at the last byte
        last_j = jnp.minimum(rowstart + LANES - 1, seqend - 1)
        rel_last = last_j - m0
        droot_last = (rel_last // offc) * offc
        has_far = covers & (ml > 0) & (last_j >= litend) \
            & (droot_last >= LOCAL_MAX)
        anchor = jnp.maximum(rowstart, litend)
        dmul = ((anchor - m0) // offc) * offc
        rank_here = jnp.where(has_far, far_cnt, -1)
        w_delta = jnp.where((rank_iota == rank_here) & (rank_here >= 0),
                            dmul, w_delta)
        far_cnt = far_cnt + jnp.where(has_far, 1, 0)
        far_over = jnp.maximum(
            far_over, jnp.where(far_cnt > FAR_RANKS, 1, 0))

        m = (lv != 0) & (st <= j_abs)
        sel_litend = jnp.where(m, litend, sel_litend)
        sel_delta = jnp.where(m, slabs["litsrc"][:, c:c + 1] - st,
                              sel_delta)
        sel_m0 = jnp.where(m, m0, sel_m0)
        sel_off = jnp.where(m, offc, sel_off)
        sel_rank = jnp.where(m, rank_here, sel_rank)

    valid = j_abs < total_out
    is_lit = valid & (j_abs < sel_litend)
    is_match = valid & ~is_lit
    bad = is_match & ((sel_off <= 0) | (sel_m0 < 0))
    err = (jnp.max(jnp.where(bad, 1, 0)) + jnp.max(hazard)
           + jnp.max(far_over) + jnp.max(recs["err"]))

    offc = jnp.maximum(sel_off, 1)
    rel = j_abs - sel_m0
    droot = (rel // offc) * offc
    local = is_match & (droot < LOCAL_MAX)
    dloc = jnp.where(local, droot, 0)
    far = is_match & ~local
    frank = jnp.where(far, sel_rank, -1)
    # a far byte whose cand was not registered (ml==0 impossible here, but
    # rank -1 would mean a bookkeeping hole): flag
    err = err + jnp.max(jnp.where(far & (frank < 0), 1, 0))
    lit_src = jnp.where(is_lit, j_abs + sel_delta, 0)

    return dict(is_lit=is_lit, lit_src=lit_src, local=local, dloc=dloc,
                far=far, frank=frank, w_delta=w_delta, valid=valid,
                total_out=total_out, err=err, j_abs=j_abs)


def gather_literals(maps, comp_rows):
    """Monotonic row-pair literal gather: out bytes <- comp[lit_src]."""
    out_rows = maps["is_lit"].shape[0]
    cr = comp_rows.shape[0]
    src = jnp.where(maps["is_lit"], maps["lit_src"], 1 << 28)
    src0 = jnp.min(src, axis=1, keepdims=True)
    src0 = jnp.where(src0 == 1 << 28, 0, src0)
    q = jnp.clip(src0 >> 7, 0, cr - 1)
    crows = jax.lax.broadcasted_iota(jnp.int32, (out_rows, cr), 1)
    cf = comp_rows.astype(jnp.float32)
    winA = jnp.dot((crows == q).astype(jnp.float32), cf,
                   preferred_element_type=jnp.float32)
    winB = jnp.dot((crows == jnp.minimum(q + 1, cr - 1)).astype(
        jnp.float32), cf, preferred_element_type=jnp.float32)
    win = jnp.concatenate([winA, winB], axis=1).astype(jnp.int32)
    w = jnp.clip(maps["lit_src"] - (q << 7), 0, 255)
    return jnp.where(maps["is_lit"], _window_select(win, w), 0)


def resolve_matches(maps, lit_out, out_rows: int, max_rounds: int = 24):
    """Fixed-point match resolution.

    lit_out: (out_rows, 128) with literal bytes placed, match bytes 0.
    Local bytes (root distance < LOCAL_MAX) resolve via a delta-select
    scan over the transposed output; far bytes via per-(row, rank)
    constant-delta affine windows (MXU column gathers + per-lane sublane
    roll alignment). Iterates until no byte changes (cross-sequence copy
    chains converge at dependency depth).
    """
    is_m = maps["local"] | maps["far"]
    # transposed views: position p = r*128 + l maps to T[l, r]
    dloc_T = jnp.transpose(maps["dloc"], (1, 0))
    local_T = jnp.transpose(maps["local"], (1, 0))
    far_T = jnp.transpose(maps["far"], (1, 0))
    frank_T = jnp.transpose(maps["frank"], (1, 0))
    lit_T = jnp.transpose(lit_out, (1, 0))
    w_delta = maps["w_delta"]  # (out_rows, FAR_RANKS)
    rowstart = (jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)
                * LANES)
    # far window descriptors per (row, rank): source base positions
    wbase = rowstart - w_delta                     # (out_rows, FAR_RANKS)

    def far_pass(cur_T, prev, base):
        """Gather far ranks [base, base+FAR_CHUNK) into prev (both
        (128, out_rows)).

        For rank rho of out row r the aligned window is
        out[wbase .. wbase+255] with wbase = 128 r - delta, gathered as a
        3-column stack anchored at 128*(wbase>>7) (arithmetic shift: a
        negative base selects column -1, whose one-hot is all-zero, so
        leading out-of-range lanes read 0 and are never used).
        """
        curf = cur_T.astype(jnp.float32)            # (128, out_rows)
        acc = prev
        rows_i = jax.lax.broadcasted_iota(
            jnp.int32, (out_rows, out_rows), 0)
        wchunk = jax.lax.dynamic_slice(
            wbase, (0, base), (out_rows, FAR_CHUNK))
        for rho in range(FAR_CHUNK):
            base_q = wchunk[:, rho:rho + 1] >> 7    # (out_rows, 1), >= -1
            qT = jnp.transpose(base_q, (1, 0))      # (1, out_rows)
            parts = []
            for dq in range(3):
                oh = (rows_i == qT + dq).astype(jnp.float32)
                parts.append(jnp.dot(curf, oh,
                                     preferred_element_type=jnp.float32))
            stack = jnp.concatenate(parts, axis=0).astype(
                jnp.int32)                          # (384, out_rows)
            phi = jnp.transpose(
                wchunk[:, rho:rho + 1] & (LANES - 1), (1, 0))  # (1, R)
            for bit in range(7):
                sh = 1 << bit
                rolled = jnp.roll(stack, -sh, axis=0)
                stack = jnp.where((phi & sh) != 0, rolled, stack)
            aligned = stack[:LANES, :]
            take = far_T & (frank_T == base + rho)
            acc = jnp.where(take, aligned, acc)
        return acc

    # far ranks cycle in chunks: round t gathers ranks
    # [FAR_CHUNK*(t mod nchunks), +FAR_CHUNK); convergence = a full cycle
    # with no byte changing
    maxrank = jnp.maximum(jnp.max(frank_T) + 1, 1)
    nchunks = (maxrank + FAR_CHUNK - 1) // FAR_CHUNK

    def one_round(cur_T, it):
        # local delta scan: fori with dynamic rolls (traced 2-D shifts)
        def dstep(d, new_T):
            m = local_T & (dloc_T == d)
            return jnp.where(m, _tshift_back_dyn(cur_T, d), new_T)

        new_T = jax.lax.fori_loop(1, LOCAL_MAX, dstep,
                                  jnp.where(local_T, 0, cur_T))
        base = FAR_CHUNK * (it % nchunks)
        farv = far_pass(cur_T, jnp.where(far_T, cur_T, 0), base)
        new_T = jnp.where(far_T, farv, new_T)
        return jnp.where(local_T | far_T, new_T, cur_T)

    def cond(carry):
        _cur, stable, it = carry
        return (it < max_rounds) & (stable < nchunks)

    def body(carry):
        cur_T, stable, it = carry
        new_T = one_round(cur_T, it)
        changed = jnp.any(new_T != cur_T)
        stable = jnp.where(changed, 0, stable + 1)
        return new_T, stable, it + 1

    first = one_round(lit_T, jnp.int32(0))
    cur_T, stable, rounds = jax.lax.while_loop(
        cond, body, (first, jnp.int32(0), jnp.int32(1)))
    # not converged (a full stable cycle never observed): the caller must
    # treat the block as unresolved and fall back — never emit silently
    # truncated fixed-point output
    conv = (stable >= nchunks).astype(jnp.int32)
    return jnp.transpose(cur_T, (1, 0)), rounds, conv


def decode_block_cpu(comp: bytes, out_size: int):
    """Full v2 decode of one block on the host jnp pipeline (parity/test
    driver; the TPU kernel wires the same phases around an SMEM walk).

    Returns (out bytes, total_out, err int, rounds int).
    """
    need = -(-max(1, len(comp)) // LANES) + 2
    # shape bucket (one XLA compile per bucket): multiples of 64, 48 floor
    nseg = max(48, -(-need // 64) * 64)
    bt = np.zeros((nseg, LANES), np.int32)
    arr = np.frombuffer(comp, np.uint8)
    bt.reshape(-1)[:len(arr)] = arr
    bt_T = jnp.asarray(bt.T.copy())
    comp_rows = jnp.asarray(bt)
    clen = jnp.int32(len(comp))

    hops = _hops_jit(bt_T, clen)
    exits = _sweep_jit(hops, clen)
    entries, ok = walk_chain_np(exits, len(comp), nseg)
    entry = jnp.asarray(entries.astype(np.int32))[None, :]
    out_rows = -(-out_size // LANES)
    # phases stay in separate jits: XLA's compile time on the combined
    # graph is superlinear in size (measured: 4 min for the parts vs
    # >25 min combined on CPU)
    recs = _rewalk_jit2(hops, entry, clen)
    maps = _classify_jit(recs, out_rows)
    lit = _lit_jit(maps, comp_rows)
    out, rounds, conv = _resolve_jit(maps, lit, out_rows)
    err = int(maps["err"]) + (0 if ok else 1) + (0 if int(conv) else 1)
    total = int(maps["total_out"])
    data = np.asarray(out).astype(np.uint8).reshape(-1)[:total].tobytes()
    return data, total, err, int(rounds)


@jax.jit
def _hops_jit(bt_T, clen):
    return build_hops(bt_T, clen)


@jax.jit
def _sweep_jit(hops, clen):
    return segment_sweep(hops, clen)


@jax.jit
def _rewalk_jit2(hops, entry, clen):
    return rewalk(hops, entry, clen)


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _classify_jit(recs, out_rows: int):
    return classify(recs, out_rows)


@jax.jit
def _lit_jit(maps, comp_rows):
    return gather_literals(maps, comp_rows)


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _resolve_jit(maps, lit, out_rows: int):
    return resolve_matches(maps, lit, out_rows)
