"""Pallas TPU wrapper for the lane-lockstep encoder.

Mirrors lockstep_tpu.py: the machine (lockstep_enc.encode_tapes) is pure
jnp over (rows,128) int32 arrays, so the kernel body loads the group's
source tape as a value, runs the machine VMEM-resident, and stores the
output tape + lengths. One grid cell per 128-block group.

Output is byte-identical to golden.compress (= LZ4_compress_default) at
every acceleration for blocks <= 64 KiB (the encoder's hashLog-13 parity
envelope, lz4e_compress.c:48-57 byU32 config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import format as F
from . import lockstep as LK
from . import lockstep_enc as LE

LANES = LK.LANES
ENC_MAX_BLOCK = 64 * 1024   # hashLog-13 byte-parity envelope


def _kernel(src_ref, n_ref, out_ref, len_ref, err_ref, *,
            out_cap: int, sr: int, accel: int):
    src = src_ref[0]
    n = n_ref[0]
    out, clen, err = LE.encode_tapes(src, n, out_cap, sr=sr, accel=accel)
    out_ref[0] = out
    len_ref[0] = clen
    err_ref[0] = err


@functools.partial(jax.jit,
                   static_argnames=("block_size", "acceleration", "sr",
                                    "interpret"))
def compress_blocks_lockstep(raw, raw_len, block_size: int,
                             acceleration: int = 1, sr: int = 256,
                             interpret: bool = False):
    """Encode a batch of independent LZ4 blocks with the lockstep engine.

    Same contract as compress_blocks_pallas (encode_kernel.py): raw uint8
    [B, block_size] zero-padded, raw_len int32 [B] ->
    (comp uint8 [B, COMPRESSBOUND(block_size)], comp_len int32 [B]).
    Byte-identical to LZ4_compress_fast(acceleration)
    (lz4e_compress.c:218-534 semantics) for block_size <= 64 KiB.
    """
    if block_size > ENC_MAX_BLOCK:
        raise ValueError(f"lockstep encoder parity envelope is "
                         f"{ENC_MAX_BLOCK} B; got {block_size}")
    raw = jnp.asarray(raw, jnp.uint8)
    raw_len = jnp.asarray(raw_len, jnp.int32)
    nb, width = raw.shape
    cb = F.compress_bound(block_size)
    out_cap = -(-cb // (4 * sr)) * (4 * sr)
    ng = -(-nb // LANES)
    pad = ng * LANES - nb
    if pad:
        raw = jnp.pad(raw, ((0, pad), (0, 0)))
        raw_len = jnp.pad(raw_len, (0, pad))
    g8 = raw.reshape(ng, LANES, width)
    gl = raw_len.reshape(ng, LANES)
    tapes = jax.vmap(LK.pack_tapes)(g8, gl)            # (ng, SW, 128)
    sw = tapes.shape[1]
    orr = out_cap // 4
    n2 = gl.reshape(ng, 1, LANES)

    out, clen, err = pl.pallas_call(
        functools.partial(_kernel, out_cap=out_cap, sr=sr,
                          accel=acceleration),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, sw, LANES), lambda g: (g, 0, 0)),
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
        # src tape + hash table + out tape as VMEM values
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tapes, n2)

    data = jax.vmap(LK.unpack_tapes)(out)              # (ng, 128, out_cap)
    data = data.reshape(ng * LANES, out_cap)[:nb, :cb]
    clen = clen.reshape(-1)[:nb]
    err = err.reshape(-1)[:nb]
    # a nonzero err means the machine failed to converge — on valid input
    # a bug, never a data condition; surface as zero length like the
    # reference's compress-failure mode (lz4e_compress.c:274-277)
    clen = jnp.where(err != 0, 0, clen)
    return data, clen
