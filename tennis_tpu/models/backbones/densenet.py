"""DenseNet-BC in NHWC flax linen.

TPU-native replacement for the gluoncv DenseNet121 backbone the reference uses for
its flagship models 0006/0042/0102 (reference train.py:204 via
``get_model('DenseNet121').features``; train_gnmt.py:150).

Design notes (TPU-first):
- NHWC layout; compute dtype configurable (bf16 at call sites), params/BN f32.
- **Dense-block formulations**: profiling on v5e showed 43 materialized
  ``concatenate`` ops eating 42% of the step at 38% HBM utilization, so an
  alternative concat-free decomposition is provided (``concat_free=True``):
  because BN is per-channel and a 1×1 conv over a concatenation equals the sum of
  per-part 1×1 convs with the kernel sliced by input channel, the growing state
  can stay a **list of parts** with ``conv1(relu(bn1(concat(parts))))`` computed
  as ``Σ_p relu(bn1_p(part_p)) @ W1_p`` — bit-identical math, zero concats.
  Measured, however, the decomposed GEMMs lose to XLA's fused big convs even
  with growth parts merged into MXU-sized 128-wide chunks (947 vs 1310 fps at
  512²; unchunked 32-wide parts: 676 fps), so the concatenating formulation
  stays the default; both share one parameter tree (a (C_total,) BN and a
  (1,1,C_total,F) kernel per layer) and the equivalence is under test.
- the feature head reproduces gluon's fixed ``AvgPool2D(7)`` + flatten (not global
  pooling), which at 512² inputs yields the 4096-d per-frame feature vectors the
  downstream pipeline (CNN-RNN, GNMT src_embed) consumes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DenseNetSpec:
    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4  # bottleneck width multiplier

    @property
    def final_channels(self) -> int:
        c = self.num_init_features
        for i, n in enumerate(self.block_config):
            c += n * self.growth_rate
            if i != len(self.block_config) - 1:
                c //= 2
        return c


DENSENET_SPECS = {
    121: DenseNetSpec((6, 12, 24, 16)),
    161: DenseNetSpec((6, 12, 36, 24), growth_rate=48, num_init_features=96),
    169: DenseNetSpec((6, 12, 32, 32)),
    201: DenseNetSpec((6, 12, 48, 32)),
}


class _SlicedBNRelu(nn.Module):
    """BatchNorm + ReLU over a *virtual concatenation* of parts.

    Parameters/stats are single (C_total,) vectors — identical to BN over the
    concatenated tensor (BN is per-channel) — sliced per part at apply time.
    Matches nn.BatchNorm's param/stat naming (scale/bias, mean/var).
    """

    total: int
    dtype: Any
    momentum: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, parts, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.total,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.total,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.total,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.total,), jnp.float32))

        offsets = []
        off = 0
        for p in parts:
            offsets.append(off)
            off += p.shape[-1]
        assert off == self.total, (off, self.total)

        if train:
            means = jnp.concatenate(
                [jnp.mean(p.astype(jnp.float32), axis=(0, 1, 2)) for p in parts]
            )
            sq_means = jnp.concatenate(
                [jnp.mean(jnp.square(p.astype(jnp.float32)), axis=(0, 1, 2))
                 for p in parts]
            )
            var = sq_means - jnp.square(means)
            mean = means
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        # stats/params stay f32 (above); the NORMALIZE pass runs in the compute
        # dtype — per-channel (scale, shift) folded on the f32 side first, so the
        # big activation tensors never materialize as f32 (the train step's
        # elementwise fusions are HBM-bound; f32 intermediates double their bytes)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        out = []
        for p, o in zip(parts, offsets):
            c = p.shape[-1]
            iv = inv[o : o + c].astype(self.dtype)
            sh = shift[o : o + c].astype(self.dtype)
            out.append(nn.relu(p.astype(self.dtype) * iv + sh))
        return out


class _SlicedConv1x1(nn.Module):
    """1×1 conv over a virtual concatenation: Σ_p part_p @ kernel_slice_p.

    The kernel param keeps the naive (1, 1, C_total, F) shape.
    """

    total: int
    features: int
    dtype: Any

    @nn.compact
    def __call__(self, parts):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.total, self.features), jnp.float32,
        )
        k = kernel[0, 0].astype(self.dtype)
        out = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            y = jnp.einsum("bhwc,cf->bhwf", p.astype(self.dtype),
                           k[off : off + c])
            out = y if out is None else out + y
            off += c
        return out


def _merge_parts(parts, pending, concat_free: bool):
    """The block state as a part list: one concatenated tensor (naive mode) or
    the untouched list (concat-free mode)."""
    if not concat_free:
        merged = jnp.concatenate(parts + pending, axis=-1) \
            if len(parts) + len(pending) > 1 else (parts + pending)[0]
        return [merged]
    return parts + pending


class _DenseLayer(nn.Module):
    """Concat-free dense layer: parts → new growth-channel part."""

    total_in: int
    growth_rate: int
    bn_size: int
    dtype: Any

    @nn.compact
    def __call__(self, parts, train: bool):
        h = _SlicedBNRelu(self.total_in, self.dtype, name="bn1")(parts, train)
        h = _SlicedConv1x1(self.total_in, self.bn_size * self.growth_rate,
                           self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        # checkpoint marker for remat="growth": saving the narrow (growth_rate)
        # layer outputs lets the block-remat replay skip every conv2 — the
        # replayed chain reconstructs concat states from saved parts instead of
        # recomputing them (no-op without a surrounding checkpoint policy)
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(h, "growth")


class _Transition(nn.Module):
    total_in: int
    out_channels: int
    dtype: Any

    @nn.compact
    def __call__(self, parts, train: bool):
        h = _SlicedBNRelu(self.total_in, self.dtype, name="bn")(parts, train)
        h = _SlicedConv1x1(self.total_in, self.out_channels, self.dtype,
                           name="conv")(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Feature extractor: (B, H, W, C) uint8/float → (B, F) flattened features."""

    spec: DenseNetSpec
    dtype: Any = jnp.bfloat16
    # measured on v5e at 512²: concat-free runs at 947 fps (128-wide chunked
    # merges; 676 fps unchunked) vs 1310 fps for the concatenating formulation —
    # XLA fuses the concat into the consuming conv better than decomposed GEMMs.
    # Kept as an option (equivalence tested) for future Pallas dense-block work.
    concat_free: bool = False
    # Rematerialization (training memory lever):
    #   None    — store everything XLA decides to (default)
    #   "block" — jax.checkpoint around EVERY dense block: only block inputs are
    #             stored; the block's forward chain (every growing concat state)
    #             is recomputed during its backward, so peak activation memory is
    #             ~the largest block's residual set instead of the sum over all
    #             blocks (per-LAYER remat cannot help here: a layer's input IS
    #             the concatenated state, which is then pinned as a residual).
    #   "hires" — checkpoint only the first two (highest-resolution) blocks:
    #             they hold most of the activation memory but a minority of the
    #             FLOPs. Measured on v5e at 512² batch 128: 322.5 samples/sec vs
    #             "block"'s 334.5 — storing blocks 2-3 pushes XLA into its own
    #             spill-rematerialization, costing more than the explicit
    #             recompute saves; "block" is the recommended training mode.
    #   "growth" — block checkpoint with policy save_only_these_names("growth"):
    #             each layer's narrow growth output is saved, so the backward
    #             replay rebuilds concat states from saved parts and skips every
    #             conv2 recompute (~40% of replay FLOPs) at the cost of storing
    #             the growth parts (~growth_rate/avg-width of the activations).
    remat: str | None = None

    def _dense_block(self, parts, i: int, num_layers: int, channels: int,
                     train: bool):
        """Run block ``i``'s layers over the part list; returns the new list.

        ``parts``/``pending`` form the virtual concatenation of the block state.
        In concat-free mode, fresh growth-width (32-ch) outputs collect in
        ``pending`` and merge into one 128-wide chunk every ``merge_every``
        layers: the sliced matmuls then all have MXU-sized K dims, and the only
        concats ever materialized are of small same-size growth tensors — never
        the growing block state.
        """
        merge_every = max(1, 128 // self.spec.growth_rate)
        pending = []
        for j in range(num_layers):
            cur = _merge_parts(parts, pending, self.concat_free)
            if not self.concat_free:
                parts, pending = cur, []
            h = _DenseLayer(channels, self.spec.growth_rate,
                            self.spec.bn_size, self.dtype,
                            name=f"block{i}_layer{j}")(cur, train)
            pending.append(h)
            channels += self.spec.growth_rate
            if len(pending) >= merge_every:
                parts.append(jnp.concatenate(pending, axis=-1)
                             if len(pending) > 1 else pending[0])
                pending = []
        return parts + pending

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.spec.num_init_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        if self.remat not in (None, "block", "hires", "growth"):
            raise ValueError(f"unknown remat mode {self.remat!r}")
        # static_argnums count the module as argument 0
        policy = (
            jax.checkpoint_policies.save_only_these_names("growth")
            if self.remat == "growth" else None
        )
        remat_fn = nn.remat(DenseNet._dense_block, static_argnums=(2, 3, 4, 5),
                            policy=policy)

        parts = [x]
        channels = self.spec.num_init_features
        for i, num_layers in enumerate(self.spec.block_config):
            wrap = self.remat in ("block", "growth") or (
                self.remat == "hires" and i < 2)
            block_fn = remat_fn if wrap else DenseNet._dense_block
            parts = block_fn(self, parts, i, num_layers, channels, train)
            channels += num_layers * self.spec.growth_rate
            if i != len(self.spec.block_config) - 1:
                cur = _merge_parts(parts, [], self.concat_free)
                out = _Transition(channels, channels // 2, self.dtype,
                                  name=f"transition{i}")(cur, train)
                channels //= 2
                parts = [out]

        parts = _merge_parts(parts, [], self.concat_free)

        parts = _SlicedBNRelu(channels, self.dtype, name="bn_final")(parts, train)
        # gluon parity: fixed 7×7 average pool, stride 7 (NOT global pooling) then
        # flatten — 512² input → 16×16 map → (2, 2, 1024) → 4096-d features.
        # Pool-per-part then channel-concat == pool of the concat; the only concat
        # left touches tiny pooled tensors.
        k = min(7, parts[0].shape[1])
        pooled = [nn.avg_pool(p, (k, k), strides=(k, k)) for p in parts]
        x = jnp.concatenate(pooled, axis=-1) if len(pooled) > 1 else pooled[0]
        return x.reshape(x.shape[0], -1)
