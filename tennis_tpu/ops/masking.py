"""Variable-length sequence masking primitives.

These reproduce MXNet's ``SequenceMask`` / ``SequenceReverse`` semantics
(used by the reference encoder at models/captioning/gnmt.py:157-159 and inside
``BidirectionalCell.unroll`` with ``valid_length``), as pure XLA-friendly ops:
static shapes, no data-dependent control flow.
"""
from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(x, valid_length, axis: int = 1, value: float = 0.0):
    """Replace positions at or beyond ``valid_length`` along ``axis`` with ``value``.

    ``x``: (B, T, ...) with batch first; ``valid_length``: (B,) ints.
    """
    if valid_length is None:
        return x
    T = x.shape[axis]
    t = jnp.arange(T)
    mask = t[None, :] < valid_length[:, None].astype(jnp.int32)  # (B, T)
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    shape[axis] = T
    mask = mask.reshape(shape)
    return jnp.where(mask, x, jnp.asarray(value, x.dtype))


def reverse_sequence(x, valid_length, axis: int = 1):
    """Reverse the first ``valid_length`` elements along ``axis``; padding stays put.

    Matches MXNet ``SequenceReverse(use_sequence_length=True)``: for t < L the output
    index is L-1-t, for t >= L it is t. ``x``: (B, T, ...), ``valid_length``: (B,).
    """
    B, T = x.shape[0], x.shape[axis]
    if valid_length is None:
        return jnp.flip(x, axis=axis)
    t = jnp.arange(T)[None, :]  # (1, T)
    L = valid_length[:, None].astype(jnp.int32)  # (B, 1)
    idx = jnp.where(t < L, L - 1 - t, t)  # (B, T)
    shape = [1] * x.ndim
    shape[0] = B
    shape[axis] = T
    idx = idx.reshape(shape)
    return jnp.take_along_axis(x, idx, axis=axis)
