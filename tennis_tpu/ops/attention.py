"""Scaled Luong (dot-product) attention.

Equivalent of gluonnlp's ``_get_attention_cell('scaled_luong', units)`` used by the
reference decoder (reference models/captioning/gnmt.py:212,381-385): the query is
projected by a bias-free Dense to ``units``, scores are dot products scaled by
1/sqrt(units), masked, softmaxed, and applied to the values.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


def masked_softmax(scores, mask, axis: int = -1):
    """Softmax with boolean mask (True = attend). Fully-masked rows return zeros."""
    if mask is None:
        return nn.softmax(scores, axis=axis)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
    scores = jnp.where(mask, scores, neg)
    out = nn.softmax(scores, axis=axis)
    return jnp.where(mask.any(axis=axis, keepdims=True), out, jnp.zeros_like(out))


class LuongAttention(nn.Module):
    """query (B, Tq, C) × memory (B, Tm, units) → (context (B, Tq, units), weights)."""

    units: int
    scaled: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, keys, values, mask: Optional[jnp.ndarray] = None):
        q = nn.Dense(self.units, use_bias=False, dtype=self.dtype,
                     name="query_proj")(query)
        scores = jnp.einsum("bqc,bmc->bqm", q, keys.astype(q.dtype))
        if self.scaled:
            scores = scores / jnp.sqrt(jnp.asarray(self.units, scores.dtype))
        if mask is not None and mask.ndim == 2:  # (B, Tm) → (B, 1, Tm)
            mask = mask[:, None, :]
        weights = masked_softmax(scores, mask)
        context = jnp.einsum("bqm,bmc->bqc", weights, values.astype(q.dtype))
        return context, weights
