"""Pallas TPU LZ4 block encoder.

One grid cell encodes one block with the reference's exact greedy level-1
algorithm (lz4e/lz4e_compress.c:218-534 semantics, as re-derived in
golden.py): single-probe multiplicative hash table, skip-accelerated
candidate search, backward catch-up, LSIC emission, two-byte-rollback
refill and immediate rematch. For blocks below the small-input limit
(65547, i.e. every block size <= 64 KiB) it uses the same hash4/13-bit
table as the golden encoder and is **byte-identical to
LZ4_compress_default**; larger blocks substitute hash4 for the reference's
hash5 (no 64-bit scalar multiply on this toolchain) and remain
format-correct with near-identical ratio.

Everything scalar-latency-critical lives in SMEM (docs/Performance.md):
the packed-u32 source mirror, the hash table, and the output stream
buffer, all DMA'd in/out around a pure scalar-core compression loop. The
gather-formulated XLA encoder (ops/encode.py) measures ~0.2 MB/s on v5e
(flat ~90M elem/s gather wall); this kernel replaces it on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_sgori_tpu import format as F

LANES = 128
_HASHLOG = 13  # golden's small-input configuration (byte parity <= 64 KiB)
_TABLE_ROWS = (1 << _HASHLOG) // LANES  # 64
# Largest block the all-SMEM kernel handles: source mirror + output
# buffer + hash table must fit SMEM (~168 KB verified on v5e). Also the
# byte-parity bound: golden switches to hash5 above SMALL_INPUT_LIMIT.
PALLAS_MAX_BLOCK = 65536


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _sbyte(sref, pos, wmax):
    """Scalar byte load from a packed-u32 SMEM mirror (word-clamped: the
    skip search may probe past the end; clamped reads keep it in-bounds
    and the bound checks keep it correct)."""
    w = jnp.clip(pos >> 2, 0, wmax)
    return _srl(sref[w >> 7, w & (LANES - 1)], (pos & 3) * 8) & 255


def _sread32(sref, pos, wmax):
    """Scalar unaligned LE32 load from the packed-u32 SMEM mirror."""
    w = jnp.clip(pos >> 2, 0, wmax)
    sh = (pos & 3) * 8
    lo = _srl(sref[w >> 7, w & (LANES - 1)], sh)
    w1 = jnp.minimum(w + 1, wmax)
    hi_word = sref[w1 >> 7, w1 & (LANES - 1)]
    hi = jnp.where(sh == 0, 0, jax.lax.shift_left(hi_word, (32 - sh) & 31))
    return jnp.where(sh == 0, lo, lo | hi)


_HASH4_PRIME_I32 = F.HASH4_PRIME - (1 << 32)  # same bits as int32


def _hash4(v):
    return _srl(v * jnp.int32(_HASH4_PRIME_I32), 32 - _HASHLOG)


def _tget(tbl, h):
    return tbl[h >> 7, h & (LANES - 1)]


def _tput(tbl, h, v):
    tbl[h >> 7, h & (LANES - 1)] = v


def _oput_byte(oref, pos, val):
    """Append a byte into the zeroed output word buffer (OR-write)."""
    w = pos >> 2
    r, l = w >> 7, w & (LANES - 1)
    oref[r, l] = oref[r, l] | jax.lax.shift_left(val, (pos & 3) * 8)


def _oput_byte_rmw(oref, pos, val):
    """Overwrite a byte (token back-patch)."""
    w = pos >> 2
    r, l = w >> 7, w & (LANES - 1)
    sh = (pos & 3) * 8
    cur = oref[r, l] & ~jax.lax.shift_left(jnp.int32(255), sh)
    oref[r, l] = cur | jax.lax.shift_left(val, sh)


def _oput32(oref, pos, v):
    """Append exactly 4 bytes (v LE) into the zeroed output buffer."""
    w = pos >> 2
    sh = (pos & 3) * 8
    r, l = w >> 7, w & (LANES - 1)
    oref[r, l] = oref[r, l] | jax.lax.shift_left(v, sh)
    w1 = w + 1
    r1, l1 = w1 >> 7, w1 & (LANES - 1)
    spill = jnp.where(sh == 0, 0, _srl(v, (32 - sh) & 31))
    oref[r1, l1] = oref[r1, l1] | spill


def _oput_partial(oref, pos, v, nbytes):
    """Append the low `nbytes` (0..3) bytes of v — the masked tail that
    replaces a byte-at-a-time loop."""
    mask = jax.lax.shift_left(jnp.int32(1), nbytes * 8) - 1
    _oput32(oref, pos, v & mask)


def _emit_lsic(oref, opos, rem, enabled):
    """Emit LSIC extension when `enabled`: (rem // 255) 0xFF bytes then
    rem % 255. Pure no-op otherwise (callers cannot branch around side
    effects cheaply)."""

    def cond(c):
        return (c[1] >= 255) & (c[2] == 1)

    def body(c):
        p, r, e = c
        _oput_byte(oref, p, jnp.int32(255))
        return p + 1, r - 255, e

    en = jnp.where(enabled, 1, 0).astype(jnp.int32)
    p, r, _ = jax.lax.while_loop(cond, body, (opos, rem, en))

    @pl.when(enabled)
    def _():
        _oput_byte(oref, p, r)

    return jnp.where(enabled, p + 1, opos)


def _copy_literals(oref, opos, sref, spos, length, wmax):
    """Append `length` source bytes: word loop + masked tail."""

    def wcond(c):
        return c[0] + 4 <= length

    def wbody(c):
        k, _ = c
        _oput32(oref, opos + k, _sread32(sref, spos + k, wmax))
        return k + 4, 0

    k, _ = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), jnp.int32(0)))
    _oput_partial(oref, opos + k, _sread32(sref, spos + k, wmax), length - k)
    return opos + length


def _match_count(sref, p, m, climit, wmax):
    """Common-prefix length of positions p and m, capped at climit
    (word-at-a-time then byte tail), mirroring LZ4E_count semantics."""

    def wcond(c):
        mc = c[0]
        return (mc + 4 <= climit) & (_sread32(sref, p + mc, wmax)
                                     == _sread32(sref, m + mc, wmax))

    def wbody(c):
        return c[0] + 4, 0

    mc, _ = jax.lax.while_loop(wcond, wbody, (jnp.int32(0), jnp.int32(0)))

    def bcond(c):
        mc = c[0]
        return (mc < climit) & (_sbyte(sref, p + mc, wmax)
                                == _sbyte(sref, m + mc, wmax))

    def bbody(c):
        return c[0] + 1, 0

    mc, _ = jax.lax.while_loop(bcond, bbody, (mc, jnp.int32(0)))
    return mc


def _encode_kernel(rlen_ref, src_words_ref, zeros_ref, out_ref,
                   sref, oref, tbl, sem_a, sem_b, *,
                   src_word_rows: int, out_word_rows: int,
                   acceleration: int = 1):
    b = pl.program_id(0)
    n = rlen_ref[b]

    # stage source words into SMEM; zero the output buffer and hash table
    cp = pltpu.make_async_copy(src_words_ref.at[0], sref, sem_a)
    cp.start()
    cz = pltpu.make_async_copy(
        zeros_ref.at[0, pl.ds(0, out_word_rows), :], oref, sem_b)
    cz.start()
    cp.wait()
    cz.wait()
    ct = pltpu.make_async_copy(
        zeros_ref.at[0, pl.ds(0, _TABLE_ROWS), :], tbl, sem_b)
    ct.start()
    ct.wait()

    mflimit = n - F.MFLIMIT
    matchlimit = n - F.LASTLITERALS
    swmax = src_word_rows * LANES - 1  # word-index clamp for SMEM reads

    def emit_literal_run(anchor, pos, opos):
        """token placeholder + LSIC + literal copy. Returns
        (token_pos, token_high_bits, new_opos)."""
        lit = pos - anchor
        token_pos = opos
        opos = opos + 1
        big = lit >= F.RUN_MASK
        tok_hi = jnp.where(big, F.RUN_MASK << F.ML_BITS,
                           jax.lax.shift_left(lit, F.ML_BITS))
        opos = _emit_lsic(oref, opos, lit - F.RUN_MASK, big)
        opos = _copy_literals(oref, opos, sref, anchor, lit, swmax)
        return token_pos, tok_hi, opos

    def body(carry):
        pos, fh, anchor, opos, _running = carry

        # --- skip-accelerated search (lz4e_compress.c:291-336); the
        # exhaustion bound lives in the loop condition so the body is
        # select-free (scalar-op count is the kernel's cost unit) ---
        def s_cond(c):
            _pos, fpos, step, _smn, _fh, _mpos, found = c
            return (found == 0) & (fpos + step <= mflimit + 1)

        def s_body(c):
            _pos, fpos, step, smn, fh, _mpos, _found = c
            h = fh
            pos2 = fpos
            fpos2 = fpos + step
            step2 = _srl(smn, F.SKIPTRIGGER)
            smn2 = smn + 1
            mpos2 = _tget(tbl, h)
            fh2 = _hash4(_sread32(sref, fpos2, swmax))
            _tput(tbl, h, pos2)
            hit = (mpos2 + F.DISTANCE_MAX >= pos2) & \
                (_sread32(sref, mpos2, swmax) == _sread32(sref, pos2, swmax))
            return (pos2, fpos2, step2, smn2, fh2, mpos2,
                    jnp.where(hit, 1, 0))

        # searchMatchNb starts at acceleration << LZ4_SKIPTRIGGER
        # (lz4e_compress.c:296-307): acceleration > 1 widens the skip step,
        # trading ratio for speed exactly like LZ4_compress_fast
        (pos, _f, _s, _n2, fh, mpos, found) = jax.lax.while_loop(
            s_cond, s_body,
            (pos, pos, jnp.int32(1),
             jnp.int32(acceleration << F.SKIPTRIGGER), fh,
             jnp.int32(0), jnp.int32(0)))

        def no_match(args):
            pos, fh, anchor, opos = args
            return pos, fh, anchor, opos, jnp.int32(0)  # -> last literals

        def with_match(args):
            pos, fh, anchor, opos = args

            # --- catch up (lz4e_compress.c:338-349) ---
            def c_cond(c):
                p, m = c
                return (p > anchor) & (m > 0) & \
                    (_sbyte(sref, p - 1, swmax) == _sbyte(sref, m - 1, swmax))

            def c_body(c):
                return c[0] - 1, c[1] - 1

            pos2, mpos2 = jax.lax.while_loop(c_cond, c_body, (pos, mpos))

            token_pos, tok_hi, opos = emit_literal_run(anchor, pos2, opos)

            # --- match(es) with immediate rematch (goto _next_match) ---
            def m_cond(c):
                return c[6] == 1

            def m_body(c):
                pos, mpos, opos, token_pos, tok_hi, fh, _go, brk = c
                offset = pos - mpos
                _oput_byte(oref, opos, offset & 255)
                _oput_byte(oref, opos + 1, _srl(offset, 8))
                opos = opos + 2

                mc = _match_count(sref, pos + F.MINMATCH, mpos + F.MINMATCH,
                                  matchlimit - (pos + F.MINMATCH), swmax)
                pos = pos + F.MINMATCH + mc

                big = mc >= F.ML_MASK
                _oput_byte_rmw(oref, token_pos,
                               tok_hi + jnp.where(big, F.ML_MASK, mc))
                opos = _emit_lsic(oref, opos, mc - F.ML_MASK, big)

                past = pos > mflimit

                def rematch(_):
                    p2 = pos - 2
                    _tput(tbl, _hash4(_sread32(sref, p2, swmax)), p2)
                    h = _hash4(_sread32(sref, pos, swmax))
                    cand = _tget(tbl, h)
                    _tput(tbl, h, pos)
                    hit = (cand + F.DISTANCE_MAX >= pos) & \
                        (_sread32(sref, cand, swmax)
                         == _sread32(sref, pos, swmax))
                    return cand, jnp.where(hit, 1, 0)

                cand, again = jax.lax.cond(
                    past, lambda _: (jnp.int32(0), jnp.int32(0)),
                    rematch, 0)

                # next iteration state: zero-literal token at opos
                new_token_pos = jnp.where(again == 1, opos, token_pos)
                opos2 = jnp.where(again == 1, opos + 1, opos)
                return (pos, jnp.where(again == 1, cand, mpos), opos2,
                        new_token_pos, jnp.where(again == 1, 0, tok_hi),
                        fh, again, jnp.where(past, 1, 0))

            (pos3, _m, opos, _tp, _th, fh, _go, brk) = jax.lax.while_loop(
                m_cond, m_body,
                (pos2, mpos2, opos, token_pos, tok_hi, fh,
                 jnp.int32(1), jnp.int32(0)))

            anchor2 = pos3
            cont = jnp.where(brk == 1, 0, 1)
            pos4 = jnp.where(brk == 1, pos3, pos3 + 1)
            fh2 = jnp.where(brk == 1, fh,
                            _hash4(_sread32(sref, pos4, swmax)))
            return pos4, fh2, anchor2, opos, jnp.int32(cont)

        return jax.lax.cond(found == 1, with_match, no_match,
                            (pos, fh, anchor, opos))

    def cond(carry):
        return carry[4] == 1

    # inputs shorter than MIN_LENGTH are literal-only (golden.compress)
    searchable = n >= F.MIN_LENGTH

    def init_table(_):
        _tput(tbl, _hash4(_sread32(sref, 0, swmax)), jnp.int32(0))
        return _hash4(_sread32(sref, 1, swmax))

    fh0 = jax.lax.cond(searchable, init_table, lambda _: jnp.int32(0), 0)
    pos0 = jnp.int32(1)
    run0 = jnp.where(searchable, 1, 0).astype(jnp.int32)

    _p, _fh, anchor, opos, _r = jax.lax.while_loop(
        cond, body, (pos0, fh0, jnp.int32(0), jnp.int32(0), run0))

    # --- last literals (lz4e_compress.c:500-530) ---
    last = n - anchor
    big = last >= F.RUN_MASK
    _oput_byte(oref, opos, jnp.where(
        big, F.RUN_MASK << F.ML_BITS, jax.lax.shift_left(last, F.ML_BITS)))
    opos = opos + 1
    opos = _emit_lsic(oref, opos, last - F.RUN_MASK, big)
    opos = _copy_literals(oref, opos, sref, anchor, last, swmax)

    # comp_len rides lane 0 of the scratch tail row; out_ref is written
    # only by this DMA (mixing direct vector writes with the DMA confused
    # ref threading through the loops)
    oref[out_word_rows - 1, 0] = opos
    co = pltpu.make_async_copy(oref, out_ref.at[0], sem_a)
    co.start()
    co.wait()


def _wrows(nbytes: int) -> int:
    rows = -(-(-(-nbytes // 4)) // LANES) + 1
    return -(-rows // 8) * 8


@functools.partial(jax.jit, static_argnames=("block_size", "interpret",
                                             "acceleration"))
def _encode_pallas_jit(raw, raw_len, block_size: int,
                       interpret: bool = False, acceleration: int = 1):
    nblocks = raw.shape[0]
    cb = F.compress_bound(block_size)
    src_word_rows = _wrows(block_size + 8)
    # full 8-row tail pad (comp_len rides the last row): every DMA'd row
    # count must stay a multiple of 8 (docs/Performance.md: unaligned
    # sublane DMA faults the TPU worker)
    out_word_rows = _wrows(cb + 8) + 8

    padded = jnp.zeros((nblocks, src_word_rows * 4 * LANES), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, raw, (0, 0))
    quads = padded.reshape(nblocks, src_word_rows * LANES, 4).astype(jnp.int32)
    src_words = (quads[..., 0] | (quads[..., 1] << 8) | (quads[..., 2] << 16)
                 | (quads[..., 3] << 24)).reshape(
                     nblocks, src_word_rows, LANES)
    zero_rows = max(out_word_rows, _TABLE_ROWS)
    zeros = jnp.zeros((1, zero_rows, LANES), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, src_word_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, zero_rows, LANES), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_word_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((src_word_rows, LANES), jnp.int32),
            pltpu.SMEM((out_word_rows, LANES), jnp.int32),
            pltpu.SMEM((_TABLE_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_encode_kernel,
                               src_word_rows=src_word_rows,
                               out_word_rows=out_word_rows,
                               acceleration=acceleration)
    [outw] = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblocks, out_word_rows, LANES),
                                        jnp.int32)],
        interpret=interpret,
    )(raw_len.astype(jnp.int32), src_words, zeros)

    comp_len = outw[:, out_word_rows - 1, 0]
    words = outw[:, :out_word_rows - 1, :].reshape(nblocks, -1)
    comp = jnp.stack([words & 255, _srl_arr(words, 8) & 255,
                      _srl_arr(words, 16) & 255, _srl_arr(words, 24) & 255],
                     axis=-1).reshape(nblocks, -1).astype(jnp.uint8)
    return comp[:, :cb], comp_len


def _srl_arr(x, n):
    return jax.lax.shift_right_logical(x, n)


def compress_blocks_pallas(raw, raw_len, block_size: int,
                           interpret: bool = False, acceleration: int = 1):
    """Encode a batch of LZ4 blocks with the Pallas TPU kernel.

    Same contract as ops.compress_blocks_device (sans match_depth — this
    is the reference-exact greedy level-1 path): raw uint8
    [num_blocks, block_size], raw_len int32; returns (comp uint8
    [num_blocks, COMPRESSBOUND], comp_len int32). ``acceleration`` scales
    the skip search exactly like LZ4_compress_fast (byte parity with
    liblz4 at every acceleration, blocks <= 64 KiB).
    """
    return _encode_pallas_jit(jnp.asarray(raw), jnp.asarray(raw_len),
                              block_size, interpret,
                              max(1, int(acceleration)))
