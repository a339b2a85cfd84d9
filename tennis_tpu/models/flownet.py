"""FlowNet-S (no batch norm) in NHWC flax linen.

Rebuild of the reference's ported FlowNet-S (reference
models/vision/flownet/model.py:15-125): 6 strided encoder stages and 4
refinement stages, each predicting a 2-channel flow side-output that is
deconv-upsampled and concatenated into the next refinement. ``train=True``
returns the 5-scale flow pyramid (model.py:114-117); inference returns the
finest (quarter-resolution) flow.

Input: (B, 2, H, W, 3) image pairs — the pair folds onto channels, giving a
6-channel NHWC input (the reference reshapes NCHW likewise, model.py:86).

Padding parity: encoder convs use EXPLICIT symmetric k//2 padding — XLA 'SAME'
pads strided odd-kernel convs asymmetrically ((2,3) for k=7 s=2), which shifts
the sampling grid one pixel off the torch-ported weights (caught by the
golden-activation test). Deconvs are stride-2 kernel-4 'SAME' transposed convs,
equal to torch's pad=1 up to the outermost output ring.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class FlowNetS(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 5:  # (B, 2, H, W, 3) → (B, H, W, 6)
            B, P, H, W, C = x.shape
            x = jnp.concatenate([x[:, 0], x[:, 1]], axis=-1)
        x = x.astype(self.dtype)

        conv = lambda c, k, s, name: nn.Conv(
            c, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
            dtype=self.dtype, name=name
        )
        deconv = lambda c, name, bias=True: nn.ConvTranspose(
            c, (4, 4), strides=(2, 2), padding="SAME", use_bias=bias,
            dtype=self.dtype, name=name,
        )

        out1 = _leaky(conv(64, 7, 2, "conv1")(x))
        out2 = _leaky(conv(128, 5, 2, "conv2")(out1))
        out3 = _leaky(conv(256, 3, 1, "conv3_1")(_leaky(conv(256, 5, 2,
                                                             "conv3")(out2))))
        out4 = _leaky(conv(512, 3, 1, "conv4_1")(_leaky(conv(512, 3, 2,
                                                             "conv4")(out3))))
        out5 = _leaky(conv(512, 3, 1, "conv5_1")(_leaky(conv(512, 3, 2,
                                                             "conv5")(out4))))
        out6 = _leaky(conv(1024, 3, 1, "conv6_1")(_leaky(conv(1024, 3, 2,
                                                              "conv6")(out5))))

        flow6 = conv(2, 3, 1, "predict_flow6")(out6)
        flow6_up = deconv(2, "upflow6", bias=False)(flow6)
        up5 = _leaky(deconv(512, "deconv5")(out6))

        concat5 = jnp.concatenate([out5, up5, flow6_up], axis=-1)
        flow5 = conv(2, 3, 1, "predict_flow5")(concat5)
        flow5_up = deconv(2, "upflow5", bias=False)(flow5)
        up4 = _leaky(deconv(256, "deconv4")(concat5))

        concat4 = jnp.concatenate([out4, up4, flow5_up], axis=-1)
        flow4 = conv(2, 3, 1, "predict_flow4")(concat4)
        flow4_up = deconv(2, "upflow4", bias=False)(flow4)
        up3 = _leaky(deconv(128, "deconv3")(concat4))

        concat3 = jnp.concatenate([out3, up3, flow4_up], axis=-1)
        flow3 = conv(2, 3, 1, "predict_flow3")(concat3)
        flow3_up = deconv(2, "upflow3", bias=False)(flow3)
        up2 = _leaky(deconv(64, "deconv2")(concat3))

        concat2 = jnp.concatenate([out2, up2, flow3_up], axis=-1)
        flow2 = conv(2, 3, 1, "predict_flow2")(concat2)

        flows = tuple(f.astype(jnp.float32)
                      for f in (flow2, flow3, flow4, flow5, flow6))
        return flows if train else flows[0]
