"""Lane-lockstep sequential LZ4 decoder: the round-2 TPU-native engine.

One block per VPU lane: 128 independent blocks execute the exact
sequential LZ4 safe-decode state machine (lz4e_decompress.c:222-445
semantics, golden.decompress error contract) in SIMD. Measured match-chain
depth on real corpora is ~500-1000 (docs/Performance.md), which rules out
every fixed-point vectorized resolve; sequential execution per block with
cross-block SIMD is the decomposition that matches the hardware:

  * the per-sequence state machine is branch-free vector code on (1,128)
    registers (measured ~0.8 ns/op);
  * per-lane CONTIGUOUS RANGE copies (literal runs, match copies) run as
    band-select extracts + log-stage per-lane sublane-roll networks + byte
    funnels — contiguity beats the ~1 ns/elem masked-gather scan floor;
  * output goes through an (SR,128) staging window synced across lanes:
    lanes park at the window end, the window commits to the out tape at a
    uniform row, so no big per-lane scatters exist;
  * match sources read committed rows plus the staging window; the match
    source distance register `d` starts at the offset and doubles whenever
    a full-`d` chunk is copied, so overlapping matches (offset < length)
    materialize their period and tile it geometrically — the vector analog
    of lz4e_decompress.c:407-418's inc32/dec64 overlap tables.

Data layout (per 128-lane group, all int32):
  comp tape (CR,128): lane L's compressed stream as LE words, word w =
    bytes 4w..4w+3; bytes at positions >= clen[L] MUST be zero.
  out tape  (OR,128): lane L's decompressed words (committed windows).
  staging   (SR,128): the open output window [win, win + 4*SR bytes).

Each round advances every unparked lane through up to one full sequence:
literal-header parse (token + inline LSIC) -> literal range copy ->
offset + match-LSIC parse -> match range copy, each phase gated on the
lane's mode register. All error cases mirror golden.decompress exactly
(which mirrors lz4e_decompress.c:62-460): truncated token/LSIC/offset,
literal run past input, offset zero or beyond output, output-capacity
overrun against the per-lane expected length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import format as F

LANES = 128

# lane modes
TOK = 0       # need token (+ inline literal LSIC)
LLSIC = 1     # literal LSIC continues past the parse window
LIT = 2       # literal range copy in progress
OFF = 3       # need offset (+ inline match LSIC)
MLSIC = 4     # match LSIC continues past the parse window
MATCH = 5     # match range copy in progress
DONE = 6
ERR = 7

# engineering parameters
EW = 40       # comp window words fetched per round (160 B)
CAP = 96      # max bytes a literal/match range copy moves per round
CAPW = CAP // 4 + 2   # rows of a copy-source window
LSIC_P = 8    # LSIC bytes scanned inline per round
FR = 32       # place() frame rows (128 B; holds CAP + 3-byte shift + slack)


def _iota_rows(n, m=LANES):
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)


def _bcast(v, n):
    return jnp.broadcast_to(v, (n, LANES))


def shift_right_u(x, n):
    """Logical >> by vector n in [0, 32] (33+ undefined; 32 -> 0)."""
    y = jax.lax.shift_right_logical(x, jnp.bitwise_and(n, 31))
    if isinstance(n, int):
        return jnp.zeros_like(x) if n >= 32 else y
    return jnp.where(n >= 32, 0, y)


def shift_left_u(x, n):
    y = jax.lax.shift_left(x, jnp.bitwise_and(n, 31))
    if isinstance(n, int):
        return jnp.zeros_like(x) if n >= 32 else y
    return jnp.where(n >= 32, 0, y)


# ---------------------------------------------------------------------------
# Per-lane window primitives (static rolls + selects only — no gathers)
# ---------------------------------------------------------------------------


def rotate_up(win, s, size: int):
    """Per-lane rotate (size,128) UP by s rows: out row i = in row i+s mod.
    Shifts are kept non-negative (Mosaic's roll rejects negative)."""
    cur = win
    bit = 1
    while bit < size:
        rolled = jnp.roll(cur, size - bit, axis=0)
        cur = jnp.where(_bcast((s & bit) != 0, size), rolled, cur)
        bit <<= 1
    return cur


def rotate_down(win, s, size: int):
    """Per-lane rotate (size,128) DOWN by s rows: out row i+s mod = in row i."""
    cur = win
    bit = 1
    while bit < size:
        rolled = jnp.roll(cur, bit, axis=0)
        cur = jnp.where(_bcast((s & bit) != 0, size), rolled, cur)
        bit <<= 1
    return cur


def byteshift_up(win, t):
    """Byte stream UP by t bytes (t (1,128) in [0,4)): out byte j = in j+t."""
    w = win.shape[0]
    nxt = jnp.concatenate([win[1:], jnp.zeros((1, LANES), jnp.int32)], axis=0)
    tb = _bcast(t * 8, w)
    return jnp.where(_bcast(t == 0, w), win,
                     shift_right_u(win, tb) | shift_left_u(nxt, 32 - tb))


def byteshift_down(win, t):
    """Byte stream DOWN by t bytes (t (1,128) in [0,4)): out byte j+t = in j.
    Leading t bytes of the result are zero."""
    w = win.shape[0]
    prev = jnp.concatenate([jnp.zeros((1, LANES), jnp.int32), win[:-1]],
                           axis=0)
    tb = _bcast(t * 8, w)
    return jnp.where(_bcast(t == 0, w), win,
                     shift_left_u(win, tb) | shift_right_u(prev, 32 - tb))


def extract_rows(tape, row0, w: int):
    """Per-lane window extract: out[i, L] = tape[row0[L] + i, L].

    tape (R,128); row0 (1,128) int32; rows outside [0, R) read 0. One
    band-select pass over the tape + log2(band) roll stages.
    """
    R = tape.shape[0]
    band = max(w, 64)
    while band & (band - 1):
        band += 1
    band = min(band, 1 << max(0, (R - 1)).bit_length())
    nb = -(-R // band)
    # Arithmetic-shift floor division: row0 in [-band, 0) lands in band -1,
    # whose rows enter via the `hi` half of band 0 — a source window that
    # starts below the tape (committed/staging straddle) still reads the
    # tape's head rows correctly. Rows with absr < 0 are masked to 0 below.
    b_idx = row0 >> (band.bit_length() - 1)
    lo = jnp.zeros((band, LANES), jnp.int32)
    hi = jnp.zeros((band, LANES), jnp.int32)
    for b in range(nb):
        seg = tape[b * band:(b + 1) * band]
        if seg.shape[0] < band:
            seg = jnp.pad(seg, ((0, band - seg.shape[0]), (0, 0)))
        lo = jnp.where(_bcast(b_idx == b, band), seg, lo)
        hi = jnp.where(_bcast(b_idx == b - 1, band), seg, hi)
    win = jnp.concatenate([lo, hi], axis=0)
    s = row0 - b_idx * band
    out = rotate_up(win, s, 2 * band)[:w]
    absr = _bcast(row0, w) + _iota_rows(w)
    return jnp.where((absr >= 0) & (absr < R), out, 0)


def extract_bytes(tape, bytepos, w: int):
    """Per-lane byte-aligned window: out[i, L] = LE word of tape bytes
    bytepos[L]+4i .. +3 (w static words; bytes outside the tape read 0)."""
    win = extract_rows(tape, bytepos >> 2, w + 1)
    return byteshift_up(win, bytepos & 3)[:w]


def funnel(win, t, w_out: int):
    """(w_out,128) byte-aligned window starting at byte t of `win`
    (t (1,128) in [0, 4*W)). Valid output bytes: j < 4*W - t - 3; bytes
    past that wrap (callers clip their use to the valid span)."""
    W = win.shape[0]
    cur = rotate_up(win, t >> 2, W)
    return byteshift_up(cur, t & 3)[:w_out]


def byte_mask(w: int, b0, b1):
    """(w,128) int32 blend mask: 0xFF at window byte positions [b0, b1)."""
    rows4 = _iota_rows(w) * 4
    bm = jnp.zeros((w, LANES), jnp.int32)
    for k in range(4):
        inb = (rows4 + k >= _bcast(b0, w)) & (rows4 + k < _bcast(b1, w))
        bm = bm | jnp.where(inb, jnp.int32(np.int32(np.uint32(255) << (8 * k))), 0)
    return bm


def place(stag, stream, dst_rel, k):
    """Blend stream bytes [0, k) into staging at per-lane byte offset
    dst_rel. stream: (Wp,128) byte-aligned window, Wp <= FR; k (1,128) in
    [0, CAP] with dst_rel + k <= 4*SR (k == 0 lanes are no-ops).

    Strategy: build a 2-frame (2*FR,128) image with the payload shifted to
    its offset-within-frame, byte-mask it there (small shapes), then
    scatter whole frames into the staging slot grid with one select pass.
    """
    SR = stag.shape[0]
    Wp = stream.shape[0]
    fo = dst_rel & (FR * 4 - 1)          # byte offset within frame
    f = dst_rel >> (2 + FR.bit_length() - 1)   # frame slot index
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
        is_hi = _bcast(f == s - 1, FR)
        vals.append(jnp.where(is_lo, dfm[:FR], 0)
                    | jnp.where(is_hi, dfm[FR:], 0))
        msks.append(jnp.where(is_lo, bm[:FR], 0)
                    | jnp.where(is_hi, bm[FR:], 0))
    sv = jnp.concatenate(vals, axis=0)
    sm = jnp.concatenate(msks, axis=0)
    return (stag & ~sm) | sv


def _sb(win, j: int):
    """Static byte j of a byte-aligned window, as (1,128) int32."""
    return (win[j // 4:j // 4 + 1] >> (8 * (j % 4))) & 255


def _lsic_scan(byte_list, live0):
    """Scan an LSIC 255-chain over static bytes. live0 (1,128) bool gates
    lanes that are in a chain. Returns (ext_sum, bytes_consumed, live_out):
    consumed counts the terminator byte; live_out = chain still running
    after the window (all bytes were 255)."""
    ext = jnp.zeros((1, LANES), jnp.int32)
    cons = jnp.zeros((1, LANES), jnp.int32)
    live = live0
    for bj in byte_list:
        ext = ext + jnp.where(live, bj, 0)
        cons = cons + live.astype(jnp.int32)
        live = live & (bj == 255)
    return ext, cons, live


# ---------------------------------------------------------------------------
# The decode machine (pure jnp: runs under CPU jit and inside a kernel)
# ---------------------------------------------------------------------------


def _select_src(out_acc, stag, src, win_base):
    """Copy-source window at absolute byte pos src: bytes below win_base
    come from the committed out tape, bytes at/above from staging."""
    s_com = extract_bytes(out_acc, src, CAPW)
    s_stg = extract_bytes(stag, src - win_base, CAPW)
    bnd = byte_mask(CAPW, jnp.zeros_like(src), win_base - src)
    return (s_com & bnd) | (s_stg & ~bnd)


def _round(st, stag, out_acc, comp, clen, olen, win_base):
    """Advance every unparked lane through up to one sequence."""
    SR = stag.shape[0]
    win_end = win_base + SR * 4
    mode, ip, op = st["mode"], st["ip"], st["op"]
    lit, mlen, acc = st["lit"], st["mlen"], st["acc"]
    ml0, d = st["ml0"], st["d"]
    run = (mode < DONE) & (op < win_end)

    cw = extract_bytes(comp, ip, EW)     # byte 0 == comp[ip]
    b = [_sb(cw, j) for j in range(LSIC_P + 2)]

    # ---- phase H: literal header (token + inline LSIC / continuation) ----
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
    # golden: truncated token/LSIC (zero-padded tape ends every 255-chain,
    # so a chain that "continues" past clen is impossible; the consumed
    # check catches every truncation) + literal run / output-capacity.
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
    lit_src = funnel(cw, cons, CAPW)
    stag = place(stag, lit_src, op - win_base, k_l)
    op = op + k_l
    ip = ip + k_l
    cons = cons + k_l
    lit = lit - k_l
    lit_done = l_run & (lit == 0)
    at_end = lit_done & (ip == clen)     # literal-only last sequence
    mode = jnp.where(at_end, DONE, jnp.where(lit_done, OFF, mode))

    # ---- phase O: offset + match-length header ----
    o_l = run & (mode == OFF)
    m_l = run & (mode == MLSIC)
    ow = funnel(cw, cons, 4)
    ob = [_sb(ow, j) for j in range(LSIC_P + 2)]
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
    k_m = jnp.clip(jnp.minimum(jnp.minimum(mlen, win_end - op),
                               jnp.minimum(jnp.int32(CAP), d)), 0)
    k_m = jnp.where(m_run, k_m, 0)
    src = _select_src(out_acc, stag, op - d, win_base)
    stag = place(stag, src, op - win_base, k_m)
    op = op + k_m
    mlen = mlen - k_m
    d = jnp.where(m_run & (k_m == d) & (d < CAP), 2 * d, d)
    mode = jnp.where(m_run & (mlen == 0), TOK, mode)

    st2 = dict(mode=mode, ip=ip, op=op, lit=lit, mlen=mlen, acc=acc,
               ml0=ml0, d=d, rounds=st["rounds"] + 1)
    return st2, stag


def decode_tapes(comp, clen, olen, out_cap: int, sr: int = 1024):
    """Decode 128 lane-major blocks.

    comp (CR,128) int32 LE word tape, zero beyond clen[L]; clen/olen
    (1,128) int32 compressed / expected-output byte counts (olen is the
    golden `max_output` bound); out_cap static per-lane output capacity in
    bytes, a multiple of 4*sr and >= max(olen).

    Returns (out (out_cap//4,128) int32 word tape, out_len (1,128),
    err (1,128) int32 — nonzero where golden.decompress would raise).
    """
    OR = out_cap // 4
    assert OR % sr == 0 and sr % FR == 0
    n_win = OR // sr

    z = jnp.zeros((1, LANES), jnp.int32)
    st = dict(mode=z, ip=z, op=z, lit=z, mlen=z, acc=z, ml0=z, d=z,
              rounds=z)
    out_acc = jnp.zeros((OR, LANES), jnp.int32)
    max_rounds = jnp.int32(4 * (comp.shape[0] + OR) + 2048)

    def win_body(w, carry):
        st, out_acc = carry
        win_base = w * sr * 4

        def cond(c):
            st, _ = c
            active = (st["mode"] < DONE) & (st["op"] < win_base + sr * 4)
            return jnp.any(active) & jnp.all(st["rounds"] < max_rounds)

        def body(c):
            st, stag = c
            return _round(st, stag, out_acc, comp, clen, olen, win_base)

        st, stag = jax.lax.while_loop(
            cond, body, (st, jnp.zeros((sr, LANES), jnp.int32)))
        # Commit the closed window at slot w. dynamic_update_slice does not
        # lower in Pallas TPU kernels; n_win is static and small, so a
        # slot-select rebuild lowers as plain vector selects.
        parts = [jnp.where(_bcast(w == s, sr), stag,
                           out_acc[s * sr:(s + 1) * sr])
                 for s in range(n_win)]
        out_acc = jnp.concatenate(parts, axis=0) if n_win > 1 else parts[0]
        return st, out_acc

    st, out_acc = jax.lax.fori_loop(0, n_win, win_body, (st, out_acc))
    err = (st["mode"] != DONE).astype(jnp.int32)
    return out_acc, jnp.where(err != 0, 0, st["op"]), err


# ---------------------------------------------------------------------------
# Tape packing (XLA host<->lane-major transposes; jit-able)
# ---------------------------------------------------------------------------


def pack_tapes(u8, valid_len):
    """Block-major bytes -> lane-major word tape.

    u8 (128, S) uint8; valid_len (128,) int32. Returns (CR,128) int32 with
    CR = ceil(S/4) rounded to a multiple of 8 (DMA tile alignment); bytes
    at positions >= valid_len are forced to zero (the machine's pad
    contract)."""
    b, s = u8.shape
    assert b == LANES
    cr = -(-s // 4)
    cr = -(-cr // 8) * 8
    x = jnp.asarray(u8, jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    x = jnp.where(pos < valid_len[:, None], x, 0)
    x = jnp.pad(x, ((0, 0), (0, cr * 4 - s)))
    x = x.reshape(b, cr, 4)
    w = x[:, :, 0] | (x[:, :, 1] << 8) | (x[:, :, 2] << 16) | (x[:, :, 3] << 24)
    return w.T


def unpack_tapes(words):
    """Lane-major word tape (OR,128) int32 -> block-major (128, OR*4) u8."""
    w = words.T
    parts = [(w >> (8 * k)) & 255 for k in range(4)]
    x = jnp.stack(parts, axis=-1)
    return x.reshape(LANES, -1).astype(jnp.uint8)
