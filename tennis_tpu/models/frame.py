"""Frame-level and temporal event-classification models.

Reimplements the reference model family (models/vision/definitions.py:10-153 and
utils/layers.py:8-48) in flax linen:

- :class:`TimeDistributed`  — reshape-style (B, T, ...) → (B·T, ...) fold; a pure
  reshape in XLA (the reference's 'reshape' style at utils/layers.py:38-46).
- :class:`FrameModel`       — backbone + optional Dense head.
- :class:`TemporalPooling`  — time-distributed model + max/mean over time.
- :class:`CNNRNN`           — time-distributed backbone → bi-GRU/LSTM(128) →
  temporal max → Dense (reference definitions.py:75-110). Recurrence is a
  ``lax.scan`` bi-RNN (tennis_tpu.ops.rnn), not a Python unroll.
- :class:`TwoStreamModel`   — RGB/flow 6-channel split, per-stream backbones,
  concat, Dense (reference definitions.py:127-153; channel split is on the NHWC
  channel axis here, reference slices NCHW axis=-3 at definitions.py:144-145).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tennis_tpu.ops.rnn import BiRNN


def time_distributed(model_fn, x, *args, **kwargs):
    """Apply ``model_fn`` over (B, T, ...) by folding time into batch.

    One reshape in, one reshape out — the backbone sees a single large (B·T) batch,
    which is exactly the MXU-friendly layout (bigger matmuls, fewer launches).
    """
    B, T = x.shape[0], x.shape[1]
    y = model_fn(x.reshape((B * T,) + x.shape[2:]), *args, **kwargs)
    return y.reshape((B, T) + y.shape[1:])


class TimeDistributed(nn.Module):
    """Module wrapper form of :func:`time_distributed`."""

    model: nn.Module

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return time_distributed(lambda f: self.model(f, *args, **kwargs), x)


class FrameModel(nn.Module):
    """Backbone + optional Dense classification head (reference definitions.py:10-33).

    ``num_classes > 0`` adds the head; ``swap`` moves a (B, T, C, ...) clip input to
    channel-first time for 3D backbones (reference definitions.py:28-29 — there it
    swaps NCTHW; here clips are (B, T, H, W, C) and 3D backbones take them as-is, so
    swap is a no-op retained for flag parity).

    ``features``/``head`` expose the two halves separately so the temporal-pooling
    wrap can pool BETWEEN them (the reference's ``TemporalPooling(num_classes=0)``
    mode, definitions.py:52-55: TimeDistributed backbone + the model's own trained
    head) — setup-style so all three methods share one param scope.
    """

    backbone: nn.Module
    num_classes: int = -1
    dtype: Any = jnp.bfloat16

    def setup(self):
        if self.num_classes > 0:
            self.classes = nn.Dense(self.num_classes, dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        x = self.features(x, train=train)
        if self.num_classes > 0:
            return self.head(x)
        return x.astype(jnp.float32)

    def features(self, x, train: bool = False):
        return self.backbone(x, train=train)

    def head(self, x):
        """Trained classification head over (pooled) backbone features."""
        x = x.reshape(x.shape[0], -1)
        return self.classes(x.astype(self.dtype)).astype(jnp.float32)


class TemporalPooling(nn.Module):
    """Max/mean pool model outputs over the time axis (reference definitions.py:36-72).

    ``feats=True`` means the input is already (B, T, F) features; otherwise the
    wrapped ``model`` runs time-distributed first. A trailing Dense head is added for
    ``num_classes > 0``. ``wrap_head=True`` is the reference's ``num_classes == 0``
    mode (definitions.py:52-55, the train.py:348-350 final-test wrap): pool the
    wrapped FrameModel's BACKBONE features over time, then apply its own trained
    head — the 0028-row configuration.
    """

    model: Optional[nn.Module] = None
    num_classes: int = -1
    pool: str = "max"
    feats: bool = False
    wrap_head: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.wrap_head:
            if not self.feats:
                x = time_distributed(
                    lambda f: self.model.features(f, train=train), x)
            x = jnp.mean(x, axis=1) if self.pool == "mean" else jnp.max(x, axis=1)
            return self.model.head(x)
        if not self.feats and self.model is not None:
            x = time_distributed(lambda f: self.model(f, train=train), x)
        x = jnp.mean(x, axis=1) if self.pool == "mean" else jnp.max(x, axis=1)
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="classes")(x)
        return x.astype(jnp.float32)


class Debug(nn.Module):
    """Tiny conv+relu model for debugging wrappers (reference
    definitions.py:113-124); the reference's own smoke test drives it through
    TimeDistributed with an L2 loss (definitions.py:156-168) — mirrored in
    tests/test_models_vision.py."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.relu(nn.Conv(4, (2, 2), padding="VALID", dtype=self.dtype,
                               name="conv1")(x))


class CNNRNN(nn.Module):
    """Time-distributed backbone → bidirectional GRU/LSTM → temporal max → Dense.

    ``model=None`` (``feats`` mode) consumes precomputed (B, T, F) features — the
    configuration of the published 0042 row (reference train.py:210-215 feats path).
    """

    model: Optional[nn.Module] = None
    num_classes: int = -1
    hidden_size: int = 128
    cell_type: str = "gru"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.model is not None:
            x = time_distributed(lambda f: self.model(f, train=train), x)
        x = x.astype(self.dtype)
        _, x = BiRNN(self.cell_type, self.hidden_size, dtype=self.dtype,
                     name="rnn")(x)
        x = jnp.max(x, axis=1)
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="classes")(x)
        return x.astype(jnp.float32)


class TwoStreamModel(nn.Module):
    """Two-stream RGB+flow model over 6-channel NHWC input
    (reference definitions.py:127-153). ``model_rgb=None`` reproduces
    ``--flow only``."""

    model_rgb: Optional[nn.Module]
    model_flow: nn.Module
    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        rgb, flow = x[..., :3], x[..., 3:6]
        flow = self.model_flow(flow, train=train)
        if self.model_rgb is not None:
            rgb = self.model_rgb(rgb, train=train)
            feats = jnp.concatenate([rgb, flow], axis=-1)
        else:
            feats = flow
        out = nn.Dense(self.num_classes, dtype=self.dtype, name="classes")(feats)
        return out.astype(jnp.float32)
