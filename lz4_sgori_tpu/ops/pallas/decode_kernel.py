"""Pallas TPU LZ4 block decoder.

One grid cell decodes one block, C-decoder style (the shape of
lz4e/lz4e_decompress.c:62-460) but built from the operations this TPU
generation does fast — measured on v5e, arbitrary per-lane gathers lower to
a ~90M elem/s serial path, so the kernel uses none:

- **byte reads** (token/LSIC/offset parsing): dynamic *sublane* row read +
  masked lane reduction (`_read_byte`);
- **bulk copies** (literals, far matches): 128-byte windows assembled from
  two dynamically-indexed rows with full-width dynamic lane rolls
  (`_window` / `_write_window`) — unaligned src/dst at vector speed;
- **near matches** (offset < 128, the RLE/overlap case that
  lz4e_decompress.c:93-94,407-418 handles with inc32/dec64 tables): a
  periodic pattern register built by lane-roll doubling, re-phased per
  chunk, so a 64 KB offset-1 run costs ~40 vector ops per 128 output
  bytes instead of 64K dependent byte copies.

Safe-decode semantics match the XLA decoder and the golden oracle: per-block
error flag on malformed input, clamped reads, no traps.

Data layout: bytes are int32 lanes in [rows, 128] tiles (one VMEM tile row
= 128 bytes of the stream). The wrapper repacks uint8 block arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import format as F

LANES = 128


def _lane_iota():
    return jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)[0]


def _read_byte(smem_ref, pos, max_word_row):
    """Byte at dynamic position `pos` from the packed-u32 SMEM mirror of
    the stream — a true scalar load (dynamic VMEM lane access would need a
    vector reduce + scalar round trip per byte, ~10x the latency)."""
    w = pos >> 2
    r = jnp.clip(w >> 7, 0, max_word_row)
    lane = w & (LANES - 1)
    word = smem_ref[r, lane]
    return (word >> ((pos & 3) * 8)) & 255


def _window(ref, pos, max_row):
    """128 consecutive bytes starting at `pos`, as int32[128]."""
    r = jnp.clip(pos >> 7, 0, max_row - 1)
    a = pos & (LANES - 1)
    rows = ref[0, pl.ds(r, 2), :]
    left = LANES - a  # roll left by `a` == roll right by LANES - a
    amt = left & (LANES - 1)  # defined roll semantics at a == 0
    l0 = pltpu.roll(rows[0:1, :], amt, axis=1)[0]
    l1 = pltpu.roll(rows[1:2, :], amt, axis=1)[0]
    return jnp.where(_lane_iota() < left, l0, l1)


def _write_window(oref, pos, w, cnt, max_row):
    """Write w[0:cnt] (cnt in [0,128]) to bytes starting at `pos`."""
    r = jnp.clip(pos >> 7, 0, max_row - 1)
    a = pos & (LANES - 1)
    rolled = pltpu.roll(w[None, :], a, axis=1)[0]
    li = _lane_iota()
    row0 = oref[0, r, :]
    m0 = (li >= a) & (li < a + cnt)
    oref[0, r, :] = jnp.where(m0, rolled, row0)
    row1 = oref[0, r + 1, :]
    m1 = li < (a + cnt - LANES)
    oref[0, r + 1, :] = jnp.where(m1, rolled, row1)


def _copy_bytes(dst_ref, dpos, src_ref, spos, length, src_max_row,
                dst_max_row):
    """Byte-granular copy in 128-byte vector chunks. In-order chunk
    processing makes self-referential copies with offset >= 128 correct
    (each chunk's source lies fully before its destination)."""
    nchunks = (length + LANES - 1) >> 7

    def body(c, _):
        off = c << 7
        w = _window(src_ref, spos + off, src_max_row)
        cnt = jnp.minimum(length - off, LANES)
        _write_window(dst_ref, dpos + off, w, cnt, dst_max_row)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def _pattern_from_seed(seed, off):
    """Extend seed[0:off] periodically across all 128 lanes by roll
    doubling: after k steps the first min(off*2^k, 128) lanes hold
    seed[i mod off]."""
    li = _lane_iota()
    p = seed

    def body(_, carry):
        p, span = carry
        shifted = pltpu.roll(p[None, :], span & (LANES - 1), axis=1)[0]
        p = jnp.where(li < span, p, shifted)
        return p, jnp.minimum(span * 2, LANES)

    p, _ = jax.lax.fori_loop(0, 7, body, (p, off))
    return p


def _copy_overlap(dst_ref, dpos, mstart, off, length, dst_max_row):
    """Match copy for offset < 128: materialize the period-`off` pattern
    once, re-phase per 128-byte chunk (phase advances by 128 mod off).
    Callers must guard with length > 0 (the seed read and modulus are
    per-call setup cost)."""
    seed = _window(dst_ref, mstart - off, dst_max_row)
    d0 = jnp.mod(jnp.int32(LANES), off)
    nchunks = (length + LANES - 1) >> 7
    li = _lane_iota()

    def body(c, phase):
        # seed' = seed rotated left by `phase` within the period
        s1 = pltpu.roll(seed[None, :], (LANES - phase) & (LANES - 1), axis=1)[0]
        s2 = pltpu.roll(seed[None, :], (LANES - phase + off) & (LANES - 1),
                        axis=1)[0]
        seedp = jnp.where(li < off - phase, s1, s2)
        w = _pattern_from_seed(seedp, off)
        chunk_off = c << 7
        cnt = jnp.minimum(length - chunk_off, LANES)
        _write_window(dst_ref, dpos + chunk_off, w, cnt, dst_max_row)
        nxt = phase + d0
        return jnp.where(nxt >= off, nxt - off, nxt)

    jax.lax.fori_loop(0, nchunks, body, jnp.int32(0))


def _read_lsic(smem_ref, ip, max_word_row, enabled):
    """LSIC extension bytes: add bytes while 255 (do-while when `enabled`,
    zero-cost skip otherwise). Returns (extra_value, new_ip)."""

    def cond(c):
        return c[2] == 255

    def body(c):
        v, p, _ = c
        b = _read_byte(smem_ref, p, max_word_row)
        return v + b, p + 1, b

    first = jnp.where(enabled, jnp.int32(255), jnp.int32(0))
    v, p, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), ip, first))
    return v, p


def _decode_kernel(clen_ref, comp_ref, words_ref, out_ref, smem_ref, sem, *,
                   out_size: int, comp_rows: int, word_rows: int,
                   out_rows: int):
    b = pl.program_id(0)
    clen = clen_ref[b]
    n = out_size
    cmax = comp_rows - 2  # clamp bound for 2-row window reads
    omax = out_rows - 2
    wmax = word_rows - 1

    # mirror the packed stream into SMEM so the parse runs on scalar loads
    cp = pltpu.make_async_copy(words_ref.at[0], smem_ref, sem)
    cp.start()
    cp.wait()

    def seq_cond(c):
        ip, op, done, err = c
        return (~done) & (~err) & (ip < clen)

    def seq_body(c):
        ip, op, _, err = c
        token = _read_byte(smem_ref, ip, wmax)
        ip = ip + 1

        # literal length
        lit = token >> F.ML_BITS
        use_ext = lit == F.RUN_MASK
        ext, ip_ext = _read_lsic(smem_ref, ip, wmax, use_ext)
        lit = jnp.where(use_ext, lit + ext, lit)
        ip = jnp.where(use_ext, ip_ext, ip)

        err = err | (ip + lit > clen) | (op + lit > n)
        lit_s = jnp.clip(lit, 0, jnp.minimum(clen - ip, n - op))
        _copy_bytes(out_ref, op, comp_ref, ip, lit_s, cmax, omax)
        ip = ip + lit
        op = op + lit

        done = ip == clen  # literal-only terminal sequence

        # offset + match length (parsed unconditionally with clamped
        # reads; ignored when terminal)
        off = _read_byte(smem_ref, ip, wmax) | \
            (_read_byte(smem_ref, ip + 1, wmax) << 8)
        ip_m = ip + 2
        ml = token & F.ML_MASK
        use_mext = (~done) & (ml == F.ML_MASK)
        mext, ip_ext2 = _read_lsic(smem_ref, ip_m, wmax, use_mext)
        ml = F.MINMATCH + jnp.where(use_mext, ml + mext, ml)
        ip_m = jnp.where(use_mext, ip_ext2, ip_m)

        bad = (off == 0) | (off > op) | (ip_m > clen) | (op + ml > n)
        err = err | ((~done) & bad)
        live = (~done) & (~err)
        ml_s = jnp.where(live, ml, 0)

        far_len = jnp.where(off >= LANES, ml_s, 0)
        _copy_bytes(out_ref, op, out_ref, op - off, far_len, omax, omax)
        near_len = jnp.where(off < LANES, ml_s, 0)

        # the pattern path's per-call setup is only worth skipping when no
        # near match; pl.when here measured slower AND bloated compile —
        # keep it branch-free
        _copy_overlap(out_ref, op, op, jnp.maximum(off, 1), near_len, omax)

        ip = jnp.where(done, ip, ip_m)
        op = op + jnp.where(done, 0, ml)
        return ip, op, done, err

    ip0 = jnp.int32(0)
    op0 = jnp.int32(0)
    ip, op, done, err = jax.lax.while_loop(
        seq_cond, seq_body, (ip0, op0, clen == 0, clen == 0))
    err = err | (~done)  # ran off the end without a terminal sequence
    # scalar results ride in the last (pad) row of the output block:
    # lane 0 = out_len, lane 1 = err (SMEM per-grid scalar outputs are not
    # representable as block specs)
    li = _lane_iota()
    olen_val = jnp.where(err, 0, op)
    out_ref[0, out_rows - 1, :] = jnp.where(
        li == 0, olen_val, jnp.where(li == 1, err.astype(jnp.int32), 0))


def _rows_for(nbytes: int) -> int:
    # +2 pad rows for 2-row window reads, rounded to the int32 sublane tile
    # (8): unaligned row counts mis-tile DMA sources on hardware
    rows = -(-nbytes // LANES) + 2
    return -(-rows // 8) * 8


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def _decode_pallas_jit(comp, comp_len, out_size: int,
                       interpret: bool = False):
    nblocks, slot = comp.shape
    comp_rows = _rows_for(slot)
    word_rows = -(-(-(-comp_rows // 4)) // 8) * 8  # 8-row aligned
    nbytes = word_rows * 4 * LANES
    padded = jnp.zeros((nblocks, nbytes), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, comp, (0, 0))
    comp_rows_i32 = padded[:, :comp_rows * LANES].reshape(
        nblocks, comp_rows, LANES).astype(jnp.int32)
    quads = padded.reshape(nblocks, word_rows * LANES, 4).astype(jnp.int32)
    comp_words_i32 = (
        quads[..., 0] | (quads[..., 1] << 8) | (quads[..., 2] << 16)
        | (quads[..., 3] << 24)).reshape(nblocks, word_rows, LANES)
    out_rows = _rows_for(out_size)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, comp_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, word_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((word_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_decode_kernel, out_size=out_size,
                               comp_rows=comp_rows, word_rows=word_rows,
                               out_rows=out_rows)
    [raw] = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, out_rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(comp_len.astype(jnp.int32), comp_rows_i32, comp_words_i32)
    out = raw.astype(jnp.uint8).reshape(nblocks, out_rows * LANES)
    return (out[:, :out_size], raw[:, out_rows - 1, 0],
            raw[:, out_rows - 1, 1] != 0)


def decompress_blocks_pallas(comp, comp_len, out_size: int,
                             interpret: bool = False):
    """Decode a batch of LZ4 blocks with the Pallas TPU kernel.

    Same contract as ops.decompress_blocks_device: comp uint8
    [num_blocks, slot], comp_len int32, returns (out uint8
    [num_blocks, out_size], out_len int32, err bool). ``interpret`` runs
    the kernel in the Pallas interpreter (CPU testing). Everything —
    repacking, kernel, unpacking — is one jitted program (one launch)."""
    return _decode_pallas_jit(jnp.asarray(comp), jnp.asarray(comp_len),
                              out_size, interpret)
