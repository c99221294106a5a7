"""Shared vector primitives for the batched codec ops.

These replace the reference's scalar scatter-gather memory layer
(lz4e/include/lz4e_defs.h:331-636 — per-byte iterator reads, wild copies,
match-length counting) with dense-array equivalents: clipped gathers,
prefix/suffix scans, little-endian word assembly, and segment expansion.
All functions operate on the last axis and broadcast over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take1(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather ``arr[..., idx]`` along the last axis with index clipping.

    Malformed-input safety is handled by error flags at the call sites, not
    by trapping — kernels must be branch-free (SURVEY.md §7 hard part 5).
    """
    return jnp.take_along_axis(
        arr, jnp.clip(idx, 0, arr.shape[-1] - 1), axis=-1)


def shift_left(arr: jax.Array, k: int, fill) -> jax.Array:
    """``out[..., i] = arr[..., i + k]``, filling the tail with `fill`."""
    if k == 0:
        return arr
    pad = jnp.full(arr.shape[:-1] + (k,), fill, dtype=arr.dtype)
    return jnp.concatenate([arr[..., k:], pad], axis=-1)


def next_false_index(mask: jax.Array) -> jax.Array:
    """``nn[..., i]`` = smallest ``j >= i`` with ``mask[..., j] == False``.

    Returns ``M`` (one past the end) where the mask is True through the end.
    Used for LSIC parsing: the run of 0xFF extension bytes ends at the first
    non-0xFF byte (lz4e_decompress.c:194-220 reads them one at a time; here
    the whole array is resolved with one reversed cumulative min).
    """
    m = mask.shape[-1]
    idx = jnp.arange(m, dtype=jnp.int32)
    idx = jnp.broadcast_to(idx, mask.shape)
    cand = jnp.where(mask, jnp.int32(m), idx)
    rev = jnp.flip(cand, axis=-1)
    nn = jnp.flip(jax.lax.cummin(rev, axis=rev.ndim - 1), axis=-1)
    return nn


def exclusive_cumsum(x: jax.Array) -> jax.Array:
    """Exclusive prefix sum along the last axis."""
    c = jnp.cumsum(x, axis=-1)
    return c - x


def le_word(b: jax.Array, nbytes: int) -> jax.Array:
    """Little-endian word starting at every byte position.

    ``out[..., i] = b[i] | b[i+1]<<8 | ...`` over int32 byte lanes; positions
    within ``nbytes-1`` of the end read zeros. This is the dense analog of the
    reference's unaligned SG reads (lz4e_defs.h:404-499).
    """
    w = b
    for k in range(1, nbytes):
        w = w | (shift_left(b, k, jnp.int32(0)) << (8 * k))
    return w


def segment_ids(starts: jax.Array, valid: jax.Array, n: int) -> jax.Array:
    """Map each position ``o in [0, n)`` to the index of its segment.

    ``starts[..., k]`` are non-decreasing segment start offsets (masked by
    ``valid``); returns ``seg[..., o] = max{k valid : starts[k] <= o}`` via a
    one-hot scatter-add + prefix sum (the expand primitive: scatter at segment
    heads, cumsum — SURVEY.md §7 layer 2b).
    """
    lead = starts.shape[:-1]
    counts = jnp.zeros(lead + (n + 1,), jnp.int32)
    clipped = jnp.where(valid, jnp.clip(starts, 0, n), n)
    counts = _scatter_add_last(counts, clipped, valid.astype(jnp.int32))
    seg = jnp.cumsum(counts[..., :n], axis=-1) - 1
    return jnp.maximum(seg, 0)


def _scatter_add_last(dest: jax.Array, idx: jax.Array, upd: jax.Array) -> jax.Array:
    """``dest[..., idx[..., k]] += upd[..., k]`` batched over leading axes."""
    if dest.ndim == 1:
        return dest.at[idx].add(upd, mode="drop")
    b = dest.shape[0]
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], idx.shape)
    flat_dest = dest.reshape(b, -1) if dest.ndim == 2 else dest
    return flat_dest.at[bidx, idx].add(upd, mode="drop")
