"""Pretrained-weight converters → flat ``.npz`` of '/'-joined flax param paths.

The reference stands on pretrained weights from three external zoos: gluoncv
ImageNet backbones (reference train.py:204), Caffe2 R(2+1)D (reference
models/vision/rdnet/utils.py:7-116) and a torch-ported FlowNet-S
(models/vision/flownet/README.md). This module provides offline converters from
the public torch/caffe2 checkpoint formats into this framework's parameter
layout; the output ``.npz`` feeds ``--pretrained_npz`` (tennis_tpu/train.py).

Array convention: torch convs are OIHW → flax HWIO ((2,3,1,0) transpose);
torch Conv3d OIDHW → flax DHWIO; linear kernels transpose.
"""
from __future__ import annotations

import re

import numpy as np

__all__ = [
    "convert_torch_densenet",
    "convert_caffe2_r21d",
    "convert_torch_flownets",
    "save_npz",
]


def _conv2d(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def save_npz(flat: dict, path: str) -> None:
    np.savez(path, **flat)


def convert_torch_densenet(state_dict, prefix: str = "backbone/") -> dict:
    """torchvision ``densenet121(…).state_dict()`` → our DenseNet layout
    (tennis_tpu/models/backbones/densenet.py). The classifier head is dropped
    (the reference retrains the Dense head on 11 classes)."""
    out = {}

    def bn(src: str, dst: str):
        out[f"{prefix}{dst}/scale"] = np.asarray(state_dict[f"{src}.weight"])
        out[f"{prefix}{dst}/bias"] = np.asarray(state_dict[f"{src}.bias"])
        out[f"{prefix}batch_stats::{dst}/mean"] = np.asarray(
            state_dict[f"{src}.running_mean"]
        )
        out[f"{prefix}batch_stats::{dst}/var"] = np.asarray(
            state_dict[f"{src}.running_var"]
        )

    out[f"{prefix}conv0/kernel"] = _conv2d(state_dict["features.conv0.weight"])
    bn("features.norm0", "bn0")

    block_re = re.compile(
        r"features\.denseblock(\d+)\.denselayer(\d+)\.(norm|conv)(\d)\.weight"
    )
    for key in state_dict:
        m = block_re.match(key)
        if not m:
            continue
        b, l, kind, idx = int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)
        dst = f"block{b - 1}_layer{l - 1}"
        src = key[: -len(".weight")]
        if kind == "conv":
            out[f"{prefix}{dst}/conv{idx}/kernel"] = _conv2d(state_dict[key])
        else:
            bn(src, f"{dst}/bn{idx}")

    for key in state_dict:
        m = re.match(r"features\.transition(\d+)\.conv\.weight", key)
        if m:
            t = int(m.group(1))
            out[f"{prefix}transition{t - 1}/conv/kernel"] = _conv2d(
                state_dict[key]
            )
            bn(f"features.transition{t}.norm", f"transition{t - 1}/bn")

    bn("features.norm5", "bn_final")
    return out


def convert_caffe2_r21d(blobs: dict, num_layers: int = 34,
                        prefix: str = "") -> dict:
    """Caffe2 R(2+1)D blob dict (the ``.pkl``'s ``blobs`` entry, VMZ release) →
    our R21D layout. Name scheme per the reference converter
    (models/vision/rdnet/utils.py:7-116): ``conv1_middle`` is the stem spatial
    conv, ``comp_<i>_conv_<j>[_middle]`` the block convs, with matching
    ``_spatbn_`` batch norms."""
    from tennis_tpu.models.r21d import R21D_SPECS

    _, layers, channels = R21D_SPECS[num_layers]
    out = {}

    def bn(src: str, dst: str):
        out[f"{prefix}{dst}/scale"] = np.asarray(blobs[src + "_s"])
        out[f"{prefix}{dst}/bias"] = np.asarray(blobs[src + "_b"])
        out[f"{prefix}batch_stats::{dst}/mean"] = np.asarray(blobs[src + "_rm"])
        out[f"{prefix}batch_stats::{dst}/var"] = np.asarray(blobs[src + "_riv"])

    # stem
    out[f"{prefix}init/spatial/kernel"] = _conv3d(blobs["conv1_middle_w"])
    bn("conv1_middle_spatbn_relu", "init/bn")
    out[f"{prefix}init/temporal/kernel"] = _conv3d(blobs["conv1_w"])
    bn("conv1_spatbn_relu", "init_bn")

    comp = 0
    for stage, num_blocks in enumerate(layers, start=1):
        for block in range(1, num_blocks + 1):
            d = f"stage{stage}_block{block}"
            for j, conv_name in ((1, "conv1"), (2, "conv2")):
                src = f"comp_{comp}_conv_{j}"
                out[f"{prefix}{d}/{conv_name}/spatial/kernel"] = _conv3d(
                    blobs[src + "_middle_w"]
                )
                bn(f"comp_{comp}_spatbn_{j}_middle", f"{d}/{conv_name}/bn")
                out[f"{prefix}{d}/{conv_name}/temporal/kernel"] = _conv3d(
                    blobs[src + "_w"]
                )
                bn(f"comp_{comp}_spatbn_{j}", f"{d}/bn{j}")
            shortcut = f"shortcut_projection_{comp}_w"
            if shortcut in blobs:
                out[f"{prefix}{d}/down/kernel"] = _conv3d(blobs[shortcut])
                bn(f"shortcut_projection_{comp}_spatbn", f"{d}/down_bn")
            comp += 1

    if "last_out_L400_w" in blobs:
        out[f"{prefix}dense/kernel"] = np.asarray(blobs["last_out_L400_w"]).T
        out[f"{prefix}dense/bias"] = np.asarray(blobs["last_out_L400_b"])
    return out


_FLOWNET_MAP = {
    "conv1.0": "conv1", "conv2.0": "conv2", "conv3.0": "conv3",
    "conv3_1.0": "conv3_1", "conv4.0": "conv4", "conv4_1.0": "conv4_1",
    "conv5.0": "conv5", "conv5_1.0": "conv5_1", "conv6.0": "conv6",
    "conv6_1.0": "conv6_1",
    "predict_flow6": "predict_flow6", "predict_flow5": "predict_flow5",
    "predict_flow4": "predict_flow4", "predict_flow3": "predict_flow3",
    "predict_flow2": "predict_flow2",
    "deconv5.0": "deconv5", "deconv4.0": "deconv4", "deconv3.0": "deconv3",
    "deconv2.0": "deconv2",
    "upsampled_flow6_to_5": "upflow6", "upsampled_flow5_to_4": "upflow5",
    "upsampled_flow4_to_3": "upflow4", "upsampled_flow3_to_2": "upflow3",
}


def convert_torch_flownets(state_dict, prefix: str = "") -> dict:
    """FlowNet2-S torch checkpoint → our FlowNetS layout. Transposed convs in
    torch are IOHW → flax ConvTranspose (kh, kw, in, out) via (2,3,0,1), PLUS a
    spatial flip: torch's conv_transpose2d is the conv gradient (correlates with
    the flipped kernel) while flax's ConvTranspose applies the kernel unflipped
    (caught by the golden-activation test, tests/test_convert_golden.py)."""
    out = {}
    for src, dst in _FLOWNET_MAP.items():
        w = state_dict.get(f"{src}.weight")
        if w is None:
            continue
        w = np.asarray(w)
        if dst.startswith(("deconv", "upflow")):
            out[f"{prefix}{dst}/kernel"] = np.transpose(
                w, (2, 3, 0, 1))[::-1, ::-1].copy()
        else:
            out[f"{prefix}{dst}/kernel"] = _conv2d(w)
        b = state_dict.get(f"{src}.bias")
        if b is not None:
            out[f"{prefix}{dst}/bias"] = np.asarray(b)
    return out


def inject_npz(params, batch_stats, flat: dict):
    """Inject a converted flat dict into (params, batch_stats) pytrees in place
    of matching paths. ``batch_stats::``-prefixed keys go to batch_stats.
    Returns (params, batch_stats, n_loaded)."""
    n = 0

    def walk(tree, path, table):
        nonlocal n
        for k, v in list(tree.items()):
            p = f"{path}{k}"
            if isinstance(v, dict):
                walk(v, p + "/", table)
            elif p in table:
                assert table[p].shape == v.shape, (p, table[p].shape, v.shape)
                tree[k] = np.asarray(table[p], dtype=np.asarray(v).dtype)
                n += 1

    param_table = {k: v for k, v in flat.items() if "batch_stats::" not in k}
    stats_table = {
        k.replace("batch_stats::", ""): v
        for k, v in flat.items() if "batch_stats::" in k
    }
    walk(params, "", param_table)
    walk(batch_stats, "", stats_table)
    return params, batch_stats, n
