"""TPU driver for the vectorized v2 decoder.

The v2 phases (decode_v2.py) were designed around this toolchain's hard
constraint — no per-lane dynamic indexing — so they contain **no gathers at
all**: only static/dynamic rolls, masked reduces, one-hot matmuls, iota
compares and while/fori. That makes them first-class XLA programs; the
heavy phases therefore run as plain jit (vmapped over blocks) and XLA owns
fusion, HBM pipelining and MXU dispatch. The one structurally scalar piece
— the ~NSEG-hop chain walk through the exit table — runs as a small Pallas
kernel against an SMEM mirror (measured 5.7 ns/hop, docs/Performance.md).

Blocks whose streams trip a v2 structural limit or malformed-input flag
(err != 0) are re-decoded by the round-1 scalar kernel
(ops/pallas/decode_kernel.py), which carries the reference-exact safe-decode
semantics (lz4e_decompress.c:62-460); v2 err flags are conservative, so
the fallback also adjudicates genuinely corrupt streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import format as F
from . import decode_v2 as V

LANES = 128


def _nseg_bucket(slot: int) -> int:
    """Shape bucket for the segment count: multiples of 64 (with a 48
    floor) bound both the compile-cache population and the padding waste
    (a 64 KiB block lands on 576 segments, 11% over its 517 need)."""
    need = -(-max(1, slot) // LANES) + 2
    return max(48, -(-need // 64) * 64)


# ---------------------------------------------------------------------------
# The chain-walk Pallas kernel
# ---------------------------------------------------------------------------


def _walk_kernel(clen_ref, ea_ref, words_ref, ent_ref, smem_ea, smem_w,
                 smem_ent, sem_a, sem_b, *, nseg: int):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(ea_ref.at[0], smem_ea, sem_a)
    cp.start()
    cw = pltpu.make_async_copy(words_ref.at[0], smem_w, sem_b)
    cw.start()
    cp.wait()
    cw.wait()
    clen = clen_ref[b]

    def init(k, _):
        smem_ent[0, k] = -1
        return 0

    jax.lax.fori_loop(0, nseg, init, 0)

    def byte_at(p):
        w = smem_w[p >> 9, (p >> 2) & 127]  # words in 128-lane rows
        return jax.lax.shift_right_logical(w, (p & 3) * 8) & 255

    max_hops = nseg * (LANES // 2) + 16

    def cond(c):
        s, i = c
        pos = (s >> V._POS_SHIFT) & 0x3FFFF
        return (pos < clen) & (i < max_hops)

    def body(c):
        s, i = c
        pos = (s >> V._POS_SHIFT) & 0x3FFFF
        seg = pos >> 7
        o = pos & (LANES - 1)

        @pl.when(smem_ent[0, seg] < 0)
        def _():
            smem_ent[0, seg] = s

        phase = s & 1
        ml = (s >> V._ML_SHIFT) & 15

        def from_tok(_):
            return smem_ea[o, seg]

        def from_off(_):
            # inline phase-1 hop: 2 offset bytes, then the match LSIC
            # chain when ml0 == 15; land on the next token state
            t0 = pos + 2

            def lcond(cc):
                return cc[1] == 255

            def lbody(cc):
                t, _ = cc
                return t + 1, byte_at(t)

            first = jnp.where(ml == 15, jnp.int32(255), jnp.int32(0))
            # the loop body consumes bytes including the terminator, so t
            # already points at the next token when it exits
            t, _last = jax.lax.while_loop(lcond, lbody, (t0, first))
            t = jnp.where(ml == 15, t, t0)
            return jnp.minimum(t, clen) << V._POS_SHIFT

        s2 = jax.lax.cond(phase == 0, from_tok, from_off, 0)
        return s2, i + 1

    s, hops = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    pos = (s >> V._POS_SHIFT) & 0x3FFFF
    ok = (pos == clen) & ((s & 1) == 0) & (hops < max_hops)
    smem_ent[1, 0] = jnp.where(ok, 1, 0)
    co = pltpu.make_async_copy(smem_ent, ent_ref.at[0], sem_a)
    co.start()
    co.wait()


@functools.partial(jax.jit, static_argnames=("nseg", "interpret"))
def _walk_blocks(ea, words, clen, nseg: int, interpret: bool = False):
    """ea (nb, 128, nseg) int32 exit table; words (nb, nseg, 32) packed
    comp words; clen (nb,). Returns (entries (nb, nseg) int32 with -1 for
    empty segments, ok (nb,) bool). Mosaic block lane dims must be
    128-aligned: ea pads its lane dim; words reshape to 128-lane rows."""
    nb = ea.shape[0]
    nseg_w = -(-nseg // LANES) * LANES
    ea_p = jnp.pad(ea, ((0, 0), (0, 0), (0, nseg_w - nseg)))
    wrows = max(8, -(-(nseg * 32) // LANES // 8) * 8)
    wflat = jnp.pad(words.reshape(nb, -1),
                    ((0, 0), (0, wrows * LANES - nseg * 32)))
    wrows_arr = wflat.reshape(nb, wrows, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, LANES, nseg_w), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wrows, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, nseg_w), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((LANES, nseg_w), jnp.int32),
            pltpu.SMEM((wrows, LANES), jnp.int32),
            pltpu.SMEM((8, nseg_w), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    [ent] = pl.pallas_call(
        functools.partial(_walk_kernel, nseg=nseg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, 8, nseg_w), jnp.int32)],
        interpret=interpret,
    )(clen.astype(jnp.int32), ea_p, wrows_arr)
    return ent[:, 0, :nseg], ent[:, 1, 0] != 0


# ---------------------------------------------------------------------------
# Batched phase drivers (plain XLA, vmapped over blocks)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nseg",))
def _prep(comp, nseg: int):
    """comp uint8 (nb, slot) -> bt_T (nb, 128, nseg), comp_rows
    (nb, nseg, 128), words (nb, nseg, 32), all int32."""
    nb, slot = comp.shape
    rows = jnp.zeros((nb, nseg * LANES), jnp.uint8)
    rows = jax.lax.dynamic_update_slice(rows, comp, (0, 0))
    comp_rows = rows.reshape(nb, nseg, LANES).astype(jnp.int32)
    bt_T = jnp.transpose(comp_rows, (0, 2, 1))
    q = comp_rows.reshape(nb, nseg, 32, 4)
    words = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
             | (q[..., 3] << 24))
    return bt_T, comp_rows, words


@jax.jit
def _hops_sweep(bt_T, clen):
    hops = jax.vmap(V.build_hops)(bt_T, clen)
    exits = jax.vmap(V.segment_sweep)(hops, clen)
    return hops, exits["ea_tok"]


@jax.jit
def _rewalk_b(hops, entries, clen):
    return jax.vmap(V.rewalk)(hops, entries[:, None, :], clen)


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _classify_b(recs, out_rows: int):
    return jax.vmap(functools.partial(V.classify, out_rows=out_rows))(recs)


@jax.jit
def _literals_b(maps, comp_rows):
    return jax.vmap(V.gather_literals)(maps, comp_rows)


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _resolve_b(maps, lit, out_rows: int):
    out, rounds, conv = jax.vmap(
        functools.partial(V.resolve_matches, out_rows=out_rows))(maps, lit)
    return out, rounds, conv


@functools.partial(jax.jit, static_argnames=("out_size",))
def _pack_out(out, total, walk_ok, err, conv, out_size: int):
    nb = out.shape[0]
    flat = out.reshape(nb, -1).astype(jnp.uint8)[:, :out_size]
    errs = (err != 0) | (~walk_ok) | (conv == 0)
    out_len = jnp.where(errs, 0, total)
    return flat, out_len.astype(jnp.int32), errs


def decompress_blocks_v2(comp, comp_len, out_size: int,
                         interpret: bool = False):
    """Batch decode with the vectorized v2 pipeline; same contract as
    ops.decompress_blocks_device. Blocks flagged err are re-decoded by the
    scalar safe kernel (exact reference error semantics)."""
    comp = jnp.asarray(comp)
    comp_len = jnp.asarray(comp_len).astype(jnp.int32)
    nb, slot = comp.shape
    nseg = _nseg_bucket(slot)
    out_rows = -(-out_size // LANES)

    bt_T, comp_rows, words = _prep(comp, nseg)
    hops, ea_tok = _hops_sweep(bt_T, comp_len)
    entries, walk_ok = _walk_blocks(ea_tok, words, comp_len, nseg,
                                    interpret)
    recs = _rewalk_b(hops, entries, comp_len)
    maps = _classify_b(recs, out_rows)
    lit = _literals_b(maps, comp_rows)
    out, _rounds, conv = _resolve_b(maps, lit, out_rows)
    flat, out_len, errs = _pack_out(out, maps["total_out"], walk_ok,
                                    maps["err"], conv, out_size)

    errs_np = np.asarray(errs)
    if errs_np.any():
        # exact-semantics fallback for flagged blocks (rare: structural
        # caps or malformed streams) via the scalar safe kernel
        from .decode_kernel import decompress_blocks_pallas
        idx = np.nonzero(errs_np)[0]
        sub = jnp.asarray(np.asarray(comp)[idx])
        subl = jnp.asarray(np.asarray(comp_len)[idx])
        o2, l2, e2 = decompress_blocks_pallas(sub, subl, out_size,
                                              interpret=interpret)
        flat_np = np.array(flat)
        len_np = np.array(out_len)
        err2_np = np.array(errs_np)
        flat_np[idx] = np.asarray(o2)[:, :out_size]
        len_np[idx] = np.asarray(l2)
        err2_np[idx] = np.asarray(e2)
        return (jnp.asarray(flat_np), jnp.asarray(len_np),
                jnp.asarray(err2_np))
    return flat, out_len, errs
