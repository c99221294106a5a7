"""Pallas TPU wrapper for the lane-lockstep decode engine.

The machine (lockstep.decode_tapes) is pure jnp over (rows,128) int32
arrays, so the kernel body is just: load the group's tapes as values, run
the machine (all state stays VMEM-resident across the round loops), store
the out tape + lengths + error flags. One grid cell per 128-block group;
groups run sequentially on the TensorCore.

Block-size envelope: comp + out tapes must fit VMEM —
(CR + OR + SR) * 512 B, about 17 MB at 64 KiB blocks (measured headroom
>= 48 MB, docs/Performance.md). Larger blocks use the streamed variant
(future work) or the portable XLA engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lockstep as LK

LANES = LK.LANES


def _kernel(comp_ref, clen_ref, olen_ref, out_ref, len_ref, err_ref, *,
            out_cap: int, sr: int):
    comp = comp_ref[0]
    clen = clen_ref[0]
    olen = olen_ref[0]
    out, out_len, err = LK.decode_tapes(comp, clen, olen, out_cap, sr)
    out_ref[0] = out
    len_ref[0] = out_len
    err_ref[0] = err


@functools.partial(jax.jit,
                   static_argnames=("out_size", "sr", "interpret"))
def decompress_blocks_lockstep(comp, comp_len, out_size: int,
                               sr: int = 1024, interpret: bool = False):
    """Decode a batch of independent LZ4 blocks with the lockstep engine.

    Same contract as decompress_blocks_pallas (decode_kernel.py): comp
    uint8 [B, slot] zero-padded, comp_len int32 [B], static out_size ->
    (out uint8 [B, out_size], out_len int32 [B], err bool [B]). err
    mirrors golden.decompress's DecodeError cases exactly
    (lz4e_decompress.c:62-460 semantics).
    """
    comp = jnp.asarray(comp, jnp.uint8)
    comp_len = jnp.asarray(comp_len, jnp.int32)
    nb, slot = comp.shape
    # stage windows need not exceed the output: small blocks sync tighter
    while sr > LK.FR and sr * 4 > max(out_size, 4 * LK.FR):
        sr //= 2
    out_cap = -(-max(out_size, 1) // (4 * sr)) * (4 * sr)
    ng = -(-nb // LANES)
    pad = ng * LANES - nb
    if pad:
        comp = jnp.pad(comp, ((0, pad), (0, 0)))
        # a single zero byte is a valid empty terminal block
        comp_len = jnp.pad(comp_len, (0, pad), constant_values=1)
        comp = comp.at[nb:, 0].set(0)
    g8 = comp.reshape(ng, LANES, slot)
    gl = comp_len.reshape(ng, LANES)
    tapes = jax.vmap(LK.pack_tapes)(g8, gl)            # (ng, CR, 128)
    cr = tapes.shape[1]
    orr = out_cap // 4
    olen = jnp.full((ng, 1, LANES), out_size, jnp.int32)
    clen2 = gl.reshape(ng, 1, LANES)

    out, out_len, err = pl.pallas_call(
        functools.partial(_kernel, out_cap=out_cap, sr=sr),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, cr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, orr, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, orr, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((ng, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
        # the machine carries the whole out tape as a VMEM value (plus a
        # transient copy at window commits): lift the 16 MB scoped default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tapes, clen2, olen)

    data = jax.vmap(LK.unpack_tapes)(out)              # (ng, 128, out_cap)
    data = data.reshape(ng * LANES, out_cap)[:nb, :out_size]
    return (data, out_len.reshape(-1)[:nb],
            err.reshape(-1)[:nb].astype(bool))
