"""Masked, batched sequence helpers.

The reference represents a sequence as a time-major ``vector<Batch>``
(batches.h ≈L1-200, unverified) and processes one text line at a time
(batch size 1). The TPU-native representation is a dense, right-padded
``[B, T, D]`` array plus an integer ``lengths[B]`` vector: static shapes
for XLA, batch dim for the MXU, per-row masks for correctness. These
helpers implement the mask/flip algebra that makes combinators like
``Reversed`` (clstm.cc ≈L800-1000) correct under right-padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_mask(lengths: jax.Array, T: int, dtype=jnp.float32) -> jax.Array:
    """[B] lengths -> [B, T] mask of 1.0 for valid steps, 0.0 for padding."""
    t = jnp.arange(T, dtype=lengths.dtype)
    return (t[None, :] < lengths[:, None]).astype(dtype)


def flip_within_length(x: jax.Array, lengths: jax.Array | None) -> jax.Array:
    """Reverse each row of a right-padded [B, T, ...] batch *within its true
    length*, leaving the padding region in place.

    This is the TPU-native semantics of the reference ``Reversed`` combinator
    (clstm.cc ≈L800-1000, unverified): the reference reverses a length-T
    sequence outright because T is always the true length there; with padded
    batches a plain ``flip`` would rotate padding into the front, so we flip
    index j -> (len-1-j) only for j < len. Involutive: applying twice is the
    identity, which is what makes forward+backward of Reversed consistent
    (gradients re-reversed, per the reference).
    """
    T = x.shape[1]
    if lengths is None:
        return jnp.flip(x, axis=1)
    j = jnp.arange(T)
    # [B, T] gather indices: len-1-j inside the valid region, identity outside.
    idx = jnp.where(j[None, :] < lengths[:, None], lengths[:, None] - 1 - j[None, :], j[None, :])
    idx = idx.astype(jnp.int32)
    # Broadcast gather over trailing feature dims.
    return jnp.take_along_axis(x, _expand_idx(idx, x.ndim), axis=1)


def _expand_idx(idx: jax.Array, ndim: int) -> jax.Array:
    """Reshape [B, T] indices to broadcast against an ndim-rank array."""
    return idx.reshape(idx.shape + (1,) * (ndim - 2))


def masked_zero(x: jax.Array, lengths: jax.Array | None) -> jax.Array:
    """Zero out the padding region of a [B, T, ...] batch."""
    if lengths is None:
        return x
    m = length_mask(lengths, x.shape[1], x.dtype)
    return x * m.reshape(m.shape + (1,) * (x.ndim - 2))
