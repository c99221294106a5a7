"""Lane-lockstep LZ4 encoder: 128 blocks per group, one block per VPU lane.

The round-2 decode engine (lockstep.py) showed the viable TPU
decomposition for this codec: the per-block algorithm is inherently
sequential, so execute it EXACTLY — but across 128 independent blocks in
SIMD. This module applies the same decomposition to the compressor
(lz4e_compress.c:218-534 semantics as re-derived in golden.py): every
round, each lane advances one step of the greedy level-1 parse, with all
per-step work expressed as (rows,128) vector ops:

  * the skip-accelerated candidate search (lz4e_compress.c:291-336) is a
    branch-free probe round: hash from a per-lane source window, hash
    table get/put via band-select extract + one-hot blend over a
    (8192,128) per-lane table (hashLog 13, golden's small-input config,
    so output is byte-identical to LZ4_compress_default for <= 64 KiB);
  * the hit round fuses backward catch-up (lz4e_compress.c:338-349) and
    the start of forward match extension (LZ4E_count) into vectorized
    window compares — most matches finish their length count in the same
    round that found them;
  * short sequences (literal run < 15, match LSIC <= 1 byte — the vast
    majority) emit token + literals + offset + match-LSIC as ONE composed
    byte stream into the staging window (one place() per round, the same
    output machinery as the decoder); long runs stream through dedicated
    header/literal/tail phases at up to CAP bytes per round;
  * the immediate-rematch path (goto _next_match, lz4e_compress.c:486-493)
    is its own round: two table inserts + one probe, then straight into
    extension with a zero-literal token.

Output is byte-identical to golden.compress (= LZ4_compress_default) at
every acceleration, because probe order, table updates, catch-up,
extension bounds (mflimit/matchlimit) and emission values all mirror the
reference exactly — only the emission *schedule* differs, which the byte
stream cannot observe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import format as F
from . import lockstep as LK

LANES = LK.LANES
CAP = LK.CAP          # max bytes any copy/emission moves per round
CAPW = LK.CAPW        # rows of an extract window (26 words = 104 B)

HASHLOG = 13          # golden small-input config: byte parity <= 64 KiB
TROWS = 1 << HASHLOG  # per-lane hash table rows (entries)

# lane modes
SRCH = 0      # skip-accelerated probe round
PREP = 1      # catch-up continuation (catch-up ran past its window)
EXTEND = 2    # forward match-length count continuation
EMIT = 3      # fused one-round emission (lit < 15, mc < 270)
HDR = 4       # token + literal-LSIC stream
LIT = 5       # literal copy stream
TAIL = 6      # offset + match-LSIC stream
REMATCH = 7   # immediate-rematch probe (zero-literal continuation)
FHDR = 8      # last-literals token + LSIC
FLIT = 9      # last-literals copy
DONE = 10

# plain int (not a jnp scalar): a traced constant here would be captured
# by pallas kernel bodies that call into this machine
_HASH4_MUL = F.HASH4_PRIME - (1 << 32)

_iota_rows = LK._iota_rows
_bcast = LK._bcast


def _hash4(v):
    return LK.shift_right_u(v * _HASH4_MUL, 32 - HASHLOG)


def _r32(win, j: int):
    """Static-offset unaligned LE32 read from a byte-aligned window."""
    lo = win[j // 4:j // 4 + 1]
    sh = (j % 4) * 8
    if sh == 0:
        return lo
    hi = win[j // 4 + 1:j // 4 + 2]
    return LK.shift_right_u(lo, sh) | LK.shift_left_u(hi, 32 - sh)


def _tget(tbl, h):
    """tbl[h[L], L] per lane (band-select extract; h == -1 reads 0)."""
    return LK.extract_rows(tbl, h, 1)


def _tput2(tbl, h1, v1, on1, h2, v2, on2):
    """Two ordered one-hot inserts; the second wins on equal rows."""
    ii = _iota_rows(TROWS)
    m1 = (ii == _bcast(h1, TROWS)) & _bcast(on1, TROWS)
    tbl = jnp.where(m1, _bcast(v1, TROWS), tbl)
    m2 = (ii == _bcast(h2, TROWS)) & _bcast(on2, TROWS)
    return jnp.where(m2, _bcast(v2, TROWS), tbl)


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


def _trail_eq8(wa, wb):
    """Count of trailing equal bytes among bytes [0,8) of two windows
    (compared from byte 7 down — the catch-up direction)."""
    tc = jnp.zeros((1, LANES), jnp.int32)
    live = jnp.ones((1, LANES), bool)
    for k in range(7, -1, -1):
        eq = LK._sb(wa, k) == LK._sb(wb, k)
        live = live & eq
        tc = tc + live.astype(jnp.int32)
    return tc


def _at_byte(val_word, pos, nbytes, w: int):
    """(w,128) image with `nbytes` low bytes of val_word at byte offset
    pos (pos + nbytes <= 4*w)."""
    img = jnp.concatenate(
        [val_word, jnp.zeros((w - 1, LANES), jnp.int32)], axis=0)
    img = LK.byteshift_down(LK.rotate_down(img, pos >> 2, w), pos & 3)
    return img & LK.byte_mask(w, pos, pos + nbytes)


def _enc_round(st, stag, tbl, src, n, win_base, sr: int, accel: int):
    """Advance every unparked lane one encoder step."""
    win_end = win_base + sr * 4
    mode = st["mode"]
    fpos, step, smn = st["fpos"], st["step"], st["smn"]
    pos, mpos, anchor = st["pos"], st["mpos"], st["anchor"]
    lit, mc, d, opos = st["lit"], st["mc"], st["d"], st["opos"]
    hk, ldone = st["hk"], st["ldone"]
    mflimit = n - F.MFLIMIT
    matchlimit = n - F.LASTLITERALS

    g_srch = mode == SRCH
    g_prep = mode == PREP
    g_ext = mode == EXTEND
    g_rem = mode == REMATCH

    # ---- extract A: the per-lane primary source window ----
    a_addr = jnp.where(g_srch, fpos - 8,
             jnp.where(g_prep | g_rem, pos - 8,
             jnp.where(g_ext, pos + F.MINMATCH + mc,
             jnp.where(mode == EMIT, anchor, anchor + ldone))))
    wa = LK.extract_bytes(src, a_addr, CAPW)

    # ---- hashes + table pass (probe rounds only) ----
    # SRCH probes at fpos only when fpos + step <= mflimit + 1
    # (lz4e_compress.c:298 loop condition, checked with the incoming step)
    can_probe = g_srch & (fpos + step <= mflimit + 1)
    ra2 = _r32(wa, 6)                      # read32(pos - 2)  [REMATCH]
    ra0 = _r32(wa, 8)                      # read32(fpos/pos)
    h_main = _hash4(ra0)
    ha = _hash4(ra2)
    probe = can_probe | g_rem
    get_h = jnp.where(probe, h_main, -1)
    # REMATCH inserts pos-2 BEFORE reading h_main (lz4e_compress.c:459-467):
    # if the hashes collide the candidate is pos-2 itself
    got = _tget(tbl, get_h)
    cand = jnp.where(g_rem & (ha == h_main), pos - 2, got)
    probe_pos = jnp.where(g_rem, pos, fpos)
    tbl = _tput2(tbl, ha, pos - 2, g_rem,
                 get_h, probe_pos, probe)

    # ---- extract B: candidate / match window ----
    b_addr = jnp.where(probe, cand - 8,
             jnp.where(g_prep, mpos - 8, mpos + F.MINMATCH + mc))
    wb = LK.extract_bytes(src, b_addr, CAPW)

    # ---- hit test (probe rounds) ----
    rb0 = _r32(wb, 8)
    hit = probe & (cand + F.DISTANCE_MAX >= probe_pos) & (rb0 == ra0)
    # search exhaustion -> last literals (lz4e_compress.c:291-296)
    to_final_s = g_srch & ~can_probe
    # SRCH miss: advance the skip search (order per lz4e_compress.c:298-307:
    # new fpos uses the OLD step; the new step reads smn before increment)
    miss_s = can_probe & ~hit
    fpos = jnp.where(miss_s, fpos + step, fpos)
    step = jnp.where(miss_s, LK.shift_right_u(smn, F.SKIPTRIGGER), step)
    smn = jnp.where(miss_s, smn + 1, smn)
    # REMATCH miss: next outer iteration (anchor == pos already)
    miss_r = g_rem & ~hit
    fpos = jnp.where(miss_r, pos + 1, fpos)
    step = jnp.where(miss_r, 1, step)
    smn = jnp.where(miss_r, accel << F.SKIPTRIGGER, smn)

    # ---- catch-up (SRCH hit and PREP rounds; lz4e_compress.c:338-349) ----
    hit_s = g_srch & hit
    hit_r = g_rem & hit
    pos = jnp.where(hit_s, fpos, pos)
    mpos = jnp.where(hit_s | hit_r, cand, mpos)
    cu = hit_s | g_prep
    tc = _trail_eq8(wa, wb)
    delta = jnp.where(
        cu, jnp.minimum(jnp.minimum(tc, pos - anchor), mpos), 0)
    pos = pos - delta
    mpos = mpos - delta
    cu_more = cu & (delta == 8) & (pos > anchor) & (mpos > 0)

    # ---- forward extension (hit/PREP tail, REMATCH hit, EXTEND) ----
    ext_now = ((cu & ~cu_more) | hit_r | g_ext)
    t_off = jnp.where(g_ext, 0, 12 - delta)
    fa = LK.funnel(wa, t_off, CAPW - 3)
    fb = LK.funnel(wb, t_off, CAPW - 3)
    le = jnp.minimum(_lead_eq(fa, fb), 4 * (CAPW - 3))
    span = jnp.where(g_ext, 4 * (CAPW - 3),
                     jnp.minimum(4 * (CAPW - 3), 4 * CAPW - t_off - 3))
    cl = matchlimit - (pos + F.MINMATCH)     # match-count cap (>= 3)
    mc = jnp.where(ext_now & ~g_ext, 0, mc)
    add = jnp.minimum(jnp.minimum(le, span), cl - mc)
    mc = jnp.where(ext_now, mc + jnp.maximum(add, 0), mc)
    ext_more = ext_now & (le >= span) & (mc < cl)
    ext_done = ext_now & ~ext_more
    lit = jnp.where(hit_s | g_prep, pos - anchor, lit)
    lit = jnp.where(hit_r, 0, lit)
    d = jnp.where(hit_s | g_prep | hit_r, pos - mpos, d)

    # emission route: fused single round when the whole sequence fits one
    # composed stream (lit < 15 -> 1-byte token; mc < 270 -> <= 1 LSIC byte)
    fused_ok = (lit < F.ML_MASK) & (mc < F.ML_MASK + 255)

    # ---- fused emission (EMIT) ----
    g_emit = mode == EMIT
    k_tot = 1 + lit + 2 + (mc >= F.ML_MASK).astype(jnp.int32)
    room = win_end - opos
    emit_go = g_emit & (room >= k_tot)
    # A fused emission must land whole inside the open window: once the
    # window commits, bytes below win_base are immutable. When the tail of
    # a window is too small, demote to the streamed HDR/LIT/TAIL phases,
    # which clip to `room` byte-by-byte and straddle the boundary.
    emit_demote = g_emit & (room < k_tot)
    token = (jnp.minimum(lit, F.RUN_MASK) << F.ML_BITS) \
        | jnp.minimum(mc, F.ML_MASK)
    lit_img = LK.byteshift_down(wa, jnp.ones((1, LANES), jnp.int32)) \
        & LK.byte_mask(CAPW, jnp.ones((1, LANES), jnp.int32), 1 + lit)
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
                               room), 0)
    ff_img = LK.byte_mask(CAPW, npb - hk, npb + nff - hk)
    p_img = _at_byte(LK.shift_right_u(pw, jnp.minimum(hk, 4) * 8),
                     jnp.zeros((1, LANES), jnp.int32),
                     jnp.clip(npb - hk, 0, 2), CAPW)
    rpos = npb + nff - hk
    rby = (jnp.maximum(q, 0) - 255 * nff) * jnp.int32(0x01010101)
    r_img = jnp.where(_bcast(lsic_on & (rpos >= 0) & (rpos < CAP), CAPW),
                      rby & LK.byte_mask(CAPW, rpos, rpos + 1), 0)
    hdr_stream = ff_img | p_img | r_img

    # ---- literal copy phases (LIT / FLIT) ----
    g_lit = mode == LIT
    g_flit = mode == FLIT
    g_l = g_lit | g_flit
    l_total = jnp.where(g_flit, last, lit)
    k_l = jnp.clip(jnp.minimum(jnp.minimum(l_total - ldone, jnp.int32(CAP)),
                               room), 0)

    # ---- the round's single staging write ----
    stream = jnp.where(_bcast(g_h, CAPW), hdr_stream,
                       jnp.where(_bcast(emit_go, CAPW), emit_stream, wa))
    k = jnp.where(emit_go, k_tot,
        jnp.where(g_h, k_h, jnp.where(g_l, k_l, 0)))
    stag = LK.place(stag, stream, opos - win_base, k)
    opos = opos + k
    hk_new = jnp.where(g_h, hk + k, hk)
    ldone = jnp.where(g_l, ldone + k, ldone)

    # ---- transitions ----
    seq_end = emit_go | (g_tail & (hk_new >= total))
    pos_n = jnp.where(seq_end, pos + F.MINMATCH + mc, pos)
    anchor = jnp.where(seq_end, pos_n, anchor)
    past = seq_end & (pos_n > mflimit)

    mode = jnp.where(emit_demote, HDR,
           jnp.where(cu_more, PREP,
           jnp.where(ext_more, EXTEND,
           jnp.where(ext_done, jnp.where(fused_ok, EMIT, HDR),
           jnp.where(seq_end, jnp.where(past, FHDR, REMATCH),
           jnp.where(miss_r, SRCH,
           jnp.where(g_hdr & (hk_new >= total), LIT,
           jnp.where(g_lit & (ldone >= lit), TAIL,
           jnp.where(g_fhdr & (hk_new >= total), FLIT,
           jnp.where(g_flit & (ldone >= last), DONE,
           jnp.where(to_final_s, FHDR, mode)))))))))))
    # entering a stream phase resets its progress counters
    entering_h = (mode == HDR) & ~g_hdr | (mode == TAIL) & ~g_tail \
        | (mode == FHDR) & ~g_fhdr
    hk = jnp.where(entering_h, 0, hk_new)
    entering_l = ((mode == LIT) & ~g_lit) | ((mode == FLIT) & ~g_flit)
    ldone = jnp.where(entering_l, 0, ldone)

    st2 = dict(mode=mode, fpos=fpos, step=step, smn=smn, pos=pos_n,
               mpos=mpos, anchor=anchor, lit=lit, mc=mc, d=d, opos=opos,
               hk=hk, ldone=ldone, rounds=st["rounds"] + 1)
    return st2, stag, tbl


def encode_tapes(src, n, out_cap: int, sr: int = 1024, accel: int = 1):
    """Encode 128 lane-major blocks.

    src (SW,128) int32 LE word tape (zero beyond n[L]); n (1,128) int32
    raw byte counts; out_cap static per-lane output capacity in bytes
    (multiple of 4*sr, >= compress_bound(max n)). Returns (out tape
    (out_cap//4,128) int32, comp_len (1,128) int32, err (1,128) int32 —
    nonzero only if the machine failed to converge, which on valid input
    is a bug, never a data condition).
    """
    OR = out_cap // 4
    assert OR % sr == 0
    n_win = OR // sr

    z = jnp.zeros((1, LANES), jnp.int32)
    searchable = n >= F.MIN_LENGTH
    st = dict(mode=jnp.where(searchable, SRCH, FHDR).astype(jnp.int32),
              fpos=z + 1, step=z + 1,
              smn=z + (accel << F.SKIPTRIGGER),
              pos=z, mpos=z, anchor=z, lit=z, mc=z, d=z, opos=z,
              hk=z, ldone=z, rounds=z)
    tbl = jnp.zeros((TROWS, LANES), jnp.int32)
    out_acc = jnp.zeros((OR, LANES), jnp.int32)
    max_rounds = jnp.int32(6 * src.shape[0] + 4096)

    def win_body(w, carry):
        st, out_acc, tbl = carry
        win_base = w * sr * 4

        def cond(c):
            st, _stag, _tbl = c
            mode, opos = st["mode"], st["opos"]
            room = win_base + sr * 4 - opos
            # EMIT lanes are never parked: with room they emit, without
            # they demote to the streamed phases in one round. Streamed
            # lanes park only at zero room (they clip to room otherwise).
            emitting = (mode > EMIT) & (mode != REMATCH) & (mode != DONE)
            parked = emitting & (room <= 0)
            active = (mode != DONE) & ~parked
            return jnp.any(active) & jnp.all(st["rounds"] < max_rounds)

        def body(c):
            st, stag, tbl = c
            return _enc_round(st, stag, tbl, src, n, win_base, sr, accel)

        st, stag, tbl = jax.lax.while_loop(
            cond, body, (st, jnp.zeros((sr, LANES), jnp.int32), tbl))
        parts = [jnp.where(_bcast(w == s, sr), stag,
                           out_acc[s * sr:(s + 1) * sr])
                 for s in range(n_win)]
        out_acc = jnp.concatenate(parts, axis=0) if n_win > 1 else parts[0]
        return st, out_acc, tbl

    st, out_acc, _tbl = jax.lax.fori_loop(
        0, n_win, win_body, (st, out_acc, tbl))
    err = (st["mode"] != DONE).astype(jnp.int32)
    return out_acc, jnp.where(err != 0, 0, st["opos"]), err
