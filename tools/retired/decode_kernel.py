"""Pallas TPU LZ4 block decoder.

One grid cell decodes one block, C-decoder style (the shape of
lz4e/lz4e_decompress.c:62-460), entirely against SMEM state — the same
architecture as the encode kernel, adopted after measuring that it beats
vector-window copies: every dynamically-parameterized vector op pays a
scalar->vector transfer latency, so for LZ4's short average sequences a
pure scalar-core loop over packed-u32 SMEM words is faster than VPU
copies (docs/Performance.md).

- **parse** (token/LSIC/offset): scalar loads from the packed-u32 SMEM
  mirror of the compressed stream.
- **literal copies**: word-at-a-time scalar copies SMEM->SMEM.
- **match copies**: word-at-a-time with the doubled-offset trick for
  overlap — for offset < 4, copy 4 head bytes then advance with
  d = off * ceil(4/off), which preserves the period while keeping every
  word read 4+ bytes behind the write (the scalar analog of the
  reference's inc32/dec64 tables, lz4e_decompress.c:93-94,407-418).

Safe-decode semantics match the XLA decoder and the golden oracle:
per-block error flag on malformed input, clamped reads, no traps. The
decoded stream is DMA'd SMEM->VMEM at the end; out_len and err ride the
tail row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lz4_sgori_tpu import format as F
from encode_kernel import (_copy_literals, _oput32, _oput_byte,
                            _oput_partial, _sbyte, _sread32, _srl, _wrows)

LANES = 128
# Largest block the all-SMEM kernel handles: the compressed-stream and
# output word mirrors must both fit SMEM (~168 KB verified on v5e).
PALLAS_MAX_BLOCK = 65536


def _read_lsic(sref, ip, wmax, enabled):
    """LSIC extension bytes: add bytes while 255 (do-while when `enabled`,
    zero-cost skip otherwise). Returns (extra_value, new_ip)."""

    def cond(c):
        return c[2] == 255

    def body(c):
        v, p, _ = c
        b = _sbyte(sref, p, wmax)
        return v + b, p + 1, b

    first = jnp.where(enabled, jnp.int32(255), jnp.int32(0))
    v, p, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), ip, first))
    return v, p


def _copy_match(oref, dpos, off, length, owmax):
    """Overlap-safe scalar match copy within the output SMEM mirror."""
    # head: for off < 4, lay down 4 bytes one at a time so the doubled
    # offset d (a multiple of off, >= 4) has material to read
    head = jnp.where(off >= 4, 0, jnp.minimum(length, 4))

    def hbody(c):
        k, _ = c
        _oput_byte(oref, dpos + k, _sread_byte_out(oref, dpos + k - off,
                                                   owmax))
        return k + 1, 0

    k, _ = jax.lax.while_loop(lambda c: c[0] < head, hbody,
                              (jnp.int32(0), jnp.int32(0)))

    d = jnp.where(off >= 4, off, off * ((4 + off - 1) // off))

    def wcond(c):
        return c[0] + 4 <= length

    def wbody(c):
        k, _ = c
        _oput32(oref, dpos + k, _sread32(oref, dpos + k - d, owmax))
        return k + 4, 0

    k, _ = jax.lax.while_loop(wcond, wbody, (k, jnp.int32(0)))
    # masked tail (source words are >= 4 bytes behind, fully materialized)
    _oput_partial(oref, dpos + k, _sread32(oref, dpos + k - d, owmax),
                  length - k)


def _sread_byte_out(oref, pos, wmax):
    return _sbyte(oref, pos, wmax)


def _decode_kernel(clen_ref, words_ref, zeros_ref, out_ref, sref, oref,
                   sem_a, sem_b, *, out_size: int, word_rows: int,
                   out_word_rows: int):
    b = pl.program_id(0)
    clen = clen_ref[b]
    n = out_size
    swmax = word_rows * LANES - 1
    owmax = out_word_rows * LANES - 1

    # mirror the packed stream into SMEM; zero the output word buffer
    cp = pltpu.make_async_copy(words_ref.at[0], sref, sem_a)
    cp.start()
    cz = pltpu.make_async_copy(
        zeros_ref.at[0, pl.ds(0, out_word_rows), :], oref, sem_b)
    cz.start()
    cp.wait()
    cz.wait()

    def seq_cond(c):
        ip, op, done, err = c
        return (done == 0) & (err == 0) & (ip < clen)

    def seq_body(c):
        ip, op, _, err = c
        token = _sbyte(sref, ip, swmax)
        ip = ip + 1

        lit = token >> F.ML_BITS
        use_ext = lit == F.RUN_MASK
        ext, ip_ext = _read_lsic(sref, ip, swmax, use_ext)
        lit = jnp.where(use_ext, lit + ext, lit)
        ip = jnp.where(use_ext, ip_ext, ip)

        bad_lit = (ip + lit > clen) | (op + lit > n)
        err = jnp.where(bad_lit, 1, err)
        lit_s = jnp.clip(lit, 0, jnp.minimum(clen - ip, n - op))
        _copy_literals(oref, op, sref, ip, lit_s, swmax)
        # advance by the *clipped* length: on the err path the loop exits
        # after this iteration, and every helper below indexes from ip/op —
        # unclipped advances would push _copy_match's writes past the SMEM
        # mirror (out-of-bounds on hardware; interpret mode masks it)
        ip = ip + lit_s
        op = op + lit_s

        done = jnp.where(ip == clen, 1, 0)  # literal-only terminal sequence

        off = _sbyte(sref, ip, swmax) | (_sbyte(sref, ip + 1, swmax) << 8)
        ip_m = ip + 2
        ml = token & F.ML_MASK
        use_mext = (done == 0) & (ml == F.ML_MASK)
        mext, ip_ext2 = _read_lsic(sref, ip_m, swmax, use_mext)
        ml = F.MINMATCH + jnp.where(use_mext, ml + mext, ml)
        ip_m = jnp.where(use_mext, ip_ext2, ip_m)

        bad = (off == 0) | (off > op) | (ip_m > clen) | (op + ml > n)
        err = jnp.where((done == 0) & bad, 1, err)
        ml_s = jnp.where((done == 0) & (err == 0), ml, 0)
        _copy_match(oref, op, jnp.maximum(off, 1), ml_s, owmax)

        ip = jnp.where(done == 1, ip, ip_m)
        op = op + jnp.where(done == 1, 0, ml)
        return ip, op, done, err

    empty = jnp.where(clen == 0, 1, 0)
    ip, op, done, err = jax.lax.while_loop(
        seq_cond, seq_body,
        (jnp.int32(0), jnp.int32(0), empty, empty))
    err = jnp.where(done == 0, 1, err)

    # out_len and err ride lanes 0/1 of the tail row; out_ref is written
    # only by the DMA
    oref[out_word_rows - 1, 0] = jnp.where(err == 1, 0, op)
    oref[out_word_rows - 1, 1] = err
    co = pltpu.make_async_copy(oref, out_ref.at[0], sem_a)
    co.start()
    co.wait()


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def _decode_pallas_jit(comp, comp_len, out_size: int,
                       interpret: bool = False):
    nblocks, slot = comp.shape
    word_rows = _wrows(slot + 8)
    # full 8-row tail pad (scalars ride the last row): DMA'd row counts
    # must be multiples of 8 (docs/Performance.md: unaligned sublane DMA
    # faults the TPU worker)
    out_word_rows = _wrows(out_size + 8) + 8

    padded = jnp.zeros((nblocks, word_rows * 4 * LANES), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, comp, (0, 0))
    quads = padded.reshape(nblocks, word_rows * LANES, 4).astype(jnp.int32)
    words = (quads[..., 0] | (quads[..., 1] << 8) | (quads[..., 2] << 16)
             | (quads[..., 3] << 24)).reshape(nblocks, word_rows, LANES)
    zeros = jnp.zeros((1, out_word_rows, LANES), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, word_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_word_rows, LANES), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_word_rows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((word_rows, LANES), jnp.int32),
            pltpu.SMEM((out_word_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_decode_kernel, out_size=out_size,
                               word_rows=word_rows,
                               out_word_rows=out_word_rows)
    [outw] = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblocks, out_word_rows, LANES),
                                        jnp.int32)],
        interpret=interpret,
    )(comp_len.astype(jnp.int32), words, zeros)

    out_len = outw[:, out_word_rows - 1, 0]
    err = outw[:, out_word_rows - 1, 1] != 0
    w = outw[:, :out_word_rows - 1, :].reshape(nblocks, -1)
    out = jnp.stack([w & 255, _srl(w, 8) & 255, _srl(w, 16) & 255,
                     _srl(w, 24) & 255], axis=-1).reshape(
                         nblocks, -1).astype(jnp.uint8)
    return out[:, :out_size], out_len, err


def decompress_blocks_pallas(comp, comp_len, out_size: int,
                             interpret: bool = False):
    """Decode a batch of LZ4 blocks with the Pallas TPU kernel.

    Same contract as ops.decompress_blocks_device: comp uint8
    [num_blocks, slot], comp_len int32, returns (out uint8
    [num_blocks, out_size], out_len int32, err bool). ``interpret`` runs
    the kernel in the Pallas interpreter (CPU testing)."""
    return _decode_pallas_jit(jnp.asarray(comp), jnp.asarray(comp_len),
                              out_size, interpret)
