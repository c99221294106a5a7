"""Pallas ragged-concat kernel for the seg encoder's block assembly.

The seg engine emits, per block: nseg per-segment streams (variable
length), nseg run headers (token + literal LSIC, owner segments only),
and nseg raw literal tails — 3*nseg variable-length pieces that must
concatenate into ONE valid LZ4 block (lz4e_compress.c:536-561 has a
single stream; the seg decomposition re-joins here).

Round-4 shipped this as a vmapped ``dynamic_update_slice`` loop; with
per-batch dynamic offsets XLA lowers that to scatters (~52 ms per 8 MB
measured, docs/Performance.md primitive table) and the stage probe
pinned it at ~98 ms of the 329 ms 64 KiB encode — 30% of encode wall
time in pure data movement.

This kernel does the concat lane-parallel (lane = block) with two
structural tricks:

  * PIECE LOCKSTEP: all 128 lanes process piece index pc together
    (pc and the in-piece round counter r are SHARED scalars). Lanes
    whose piece is shorter just place k=0. Cost: rounds = sum over
    pieces of the group max — a few % over per-lane makespan, but it
    makes every stream/hdr source address a SHARED row base.
  * SHARED-BASE READS: with pc and r scalars, stream and header reads
    are ``src_ref[pl.ds(base, 32), :]`` dynamic-sublane slices (~2 ops)
    instead of per-lane banded walks. Only the raw literal tails (per-
    lane anchor offsets) use a banded extract, with spans bounded by
    the in-segment anchor spread.

Source column layout per lane (int32 word tape, rows):
  [ nseg stream slots x OCW | nseg header slots x HW | raw block RAWW ]

Writes go through the v6 staging ring + banded flush (flush spans are
bounded by the per-lane total-length spread; lanes are grouped in input
order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lockstep as LK
from .lockstep import CAP, CAPW, _bcast
from .lockstep_v4 import BAND, extract_bytes_banded
from .lockstep_v6 import BIG, FH, flush_ring, place_ring

LANES = LK.LANES
SRO = 512                   # staging ring rows (2 KiB per lane)
CROWS = CAP // 4            # 24: rows consumed per full-CAP round


def _asm_kernel(src_ref, plan_ref, out_ref, len_ref,
                srcw_ref, fl_ref, *, NSEG: int, OCW: int, HW: int,
                OR: int, SWR: int):
    g = 0
    NP = 3 * NSEG
    HBASE = NSEG * OCW                    # header region row base
    z = jnp.minimum(plan_ref[0, 0:1], 0)  # data-dependent zero (layout)
    fl_ref[...] = z
    fhlog = FH.bit_length() - 1
    rspan = SRO * 4
    blog = BAND.bit_length() - 1

    def plan_row(pc):
        """plan_ref row pc as (1,128) (8-aligned read + row select)."""
        base = (pc >> 3) << 3
        rows = plan_ref[0, pl.ds(base, 8), :]
        sel = pc - base
        v = jnp.zeros((1, LANES), jnp.int32)
        for j in range(8):
            v = v | jnp.where(sel == j, rows[j:j + 1], 0)
        return v

    def cond(c):
        pc, r, rem, op, stag = c
        return pc < NP

    def body(c):
        pc, r, rem, op, stag = c
        fl = fl_ref[...]
        trans = jnp.all(rem <= 0)
        seg_i = pc // 3
        t = pc - 3 * seg_i                # 0=stream 1=header 2=tail

        # ---- flush when the ring headroom runs low ----
        opr = op >> 2
        nfl = jnp.maximum(((opr - fl) >> fhlog) << fhlog, 0)
        f_need = jnp.any(op + CAP + 8 > fl * 4 + rspan)
        wf_lo = jnp.min(jnp.where(nfl > 0, fl, BIG)) >> blog
        wf_hi = (jnp.max(jnp.where(nfl > 0, fl + nfl, 0)) + BAND - 1) \
            >> blog

        @pl.when(f_need)
        def _do_flush():
            flush_ring(stag, out_ref, g, fl, nfl, OR,
                       bounds=(wf_lo, wf_hi))
            fl_ref[...] = fl + nfl

        fl2 = fl_ref[...]

        # ---- source window for this round (gated by piece type) ----
        @pl.when(~trans & (t == 0))
        def _read_stream():
            base = seg_i * OCW + r * CROWS
            srcw_ref[...] = src_ref[g, pl.ds(base, 32), :]

        @pl.when(~trans & (t == 1))
        def _read_hdr():
            base = HBASE + seg_i * HW + r * CROWS
            srcw_ref[...] = src_ref[g, pl.ds(base, 32), :]

        @pl.when(~trans & (t == 2))
        def _read_tail():
            # per-lane tail source: absolute byte offset from the plan
            # (row NP + seg_i), advanced by the shared round counter
            toff = plan_row(NP + seg_i) + r * CAP
            lo = jnp.min(toff) >> (2 + blog)
            hi = jnp.max(toff) >> (2 + blog)
            srcw_ref[...] = jnp.pad(
                extract_bytes_banded(src_ref, g, toff, CAPW, SWR,
                                     bounds=(lo, hi)),
                ((0, 32 - CAPW), (0, 0)))

        k = jnp.clip(rem, 0, CAP)
        srcw = srcw_ref[:CAPW + 2]
        stag = place_ring(stag, srcw, op & (rspan - 1), k)
        op = op + k
        rem = rem - k

        # ---- piece transition (shared): load the next piece's lens ----
        pc2 = jnp.where(trans, pc + 1, pc)
        r2 = jnp.where(trans, 0, r + 1)
        rem2 = jnp.where(_bcast(trans, 1) & (pc2 < NP),
                         plan_row(jnp.minimum(pc2, NP - 1)), rem)
        return pc2, r2, rem2, op, stag

    pc0 = jnp.int32(0)
    stag0 = _bcast(z, SRO)
    st = (pc0, jnp.int32(0), plan_row(jnp.int32(0)), z + 0, stag0)
    pc, r, rem, op, stag = jax.lax.while_loop(cond, body, st)

    fl = fl_ref[...]
    flush_ring(stag, out_ref, g, fl, jnp.int32(OR) - fl, OR,
               byte_lim=op)
    len_ref[0] = op


@functools.partial(jax.jit,
                   static_argnames=("nseg", "ocw", "hw", "raww",
                                    "out_rows", "interpret",
                                    "force_single"))
def assemble_segments(src, plan, nseg: int, ocw: int, hw: int,
                      raww: int, out_rows: int, interpret: bool = False,
                      force_single: bool = False):
    """Concatenate per-segment pieces into per-block LZ4 streams.

    src:  (ng, SWR, 128) int32 word tape — per-lane source column (see
          module docstring for the layout).
    plan: (ng, PR, 128) int32 — rows 3k/3k+1/3k+2 = byte lengths of
          segment k's stream / header / tail pieces; rows 3*nseg+k =
          absolute source BYTE offset of segment k's tail. PR is
          3*nseg + nseg rounded up to a multiple of 8.
    Returns (out words (ng, out_rows, 128), out_len bytes (ng,1,128)).
    """
    ng, swr, _ = src.shape
    # double-buffered multi-group grids must fit 2x(src+plan+out) in
    # VMEM; larger shapes (256 KiB blocks) invoke per group, barriered
    # so XLA cannot fuse the output concats into oversized fusions
    rows = swr + plan.shape[1] + out_rows + 1
    if ng > 1 and (force_single
                   or 2 * rows * LANES * 4 > 100 * 1024 * 1024):
        parts = [assemble_segments(src[g:g + 1], plan[g:g + 1],
                                   nseg=nseg, ocw=ocw, hw=hw, raww=raww,
                                   out_rows=out_rows, interpret=interpret)
                 for g in range(ng)]
        return tuple(jax.lax.optimization_barrier(
            jnp.concatenate([p[i] for p in parts], axis=0))
            for i in range(2))
    out, out_len = pl.pallas_call(
        functools.partial(_asm_kernel, NSEG=nseg, OCW=ocw, HW=hw,
                          OR=out_rows, SWR=swr),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, swr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, plan.shape[1], LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, out_rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, out_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((32, LANES), jnp.int32),     # source window
            pltpu.VMEM((1, LANES), jnp.int32),      # flush frontier
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(src, plan)
    return out, out_len
