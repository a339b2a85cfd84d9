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
    "rebase",
    "unmatched_keys",
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

    block_type = R21D_SPECS[num_layers][0]
    comp = 0
    for stage, num_blocks in enumerate(layers, start=1):
        for block in range(1, num_blocks + 1):
            d = f"stage{stage}_block{block}"
            if block_type == "basic":
                # both convs are factorized (BasicBlock21D: two Conv21D)
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
            else:
                # bottleneck (152): conv_1/conv_3 are plain 1×1×1, only the
                # middle 3×3×3 is factorized (Bottleneck21D layout)
                out[f"{prefix}{d}/conv1/kernel"] = _conv3d(
                    blobs[f"comp_{comp}_conv_1_w"])
                bn(f"comp_{comp}_spatbn_1", f"{d}/bn1")
                out[f"{prefix}{d}/conv2/spatial/kernel"] = _conv3d(
                    blobs[f"comp_{comp}_conv_2_middle_w"])
                bn(f"comp_{comp}_spatbn_2_middle", f"{d}/conv2/bn")
                out[f"{prefix}{d}/conv2/temporal/kernel"] = _conv3d(
                    blobs[f"comp_{comp}_conv_2_w"])
                bn(f"comp_{comp}_spatbn_2", f"{d}/bn2")
                out[f"{prefix}{d}/conv3/kernel"] = _conv3d(
                    blobs[f"comp_{comp}_conv_3_w"])
                bn(f"comp_{comp}_spatbn_3", f"{d}/bn3")
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


def rebase(flat: dict, mounts, root: str = "backbone/") -> dict:
    """Re-root a converted table at one or more param-tree mount points.

    A table written with a ``backbone/`` prefix (the FrameModel layout) is
    retargeted to e.g. the TwoStream streams (``model_rgb``/``model_flow``,
    both pretrained per reference train.py:207-209), a wrapped FrameModel
    (``model/backbone`` for CNNRNN/TemporalPooling over pixels) or the
    captioner's CNN ``src_embed`` (reference train_gnmt.py:149-170). The
    ``batch_stats::`` marker sits after the prefix, so keys are normalized
    before re-prefixing. ``mounts`` entries are '/'-joined param paths; the
    empty string mounts at the tree root.
    """
    out = {}
    for key, value in flat.items():
        stats = "batch_stats::" in key
        body = key.replace("batch_stats::", "")
        if body.startswith(root):
            body = body[len(root):]
        for mount in mounts:
            new = f"{mount}/{body}" if mount else body
            if stats:
                new = "batch_stats::" + new
            out[new] = value
    return out


def unmatched_keys(params, batch_stats, flat: dict):
    """Table keys that would NOT be consumed by :func:`inject_npz` — the
    converter CLI's acceptance check (unmatched keys mean a naming or
    architecture mismatch, mirroring the reference converter's abort-on-diff at
    models/vision/rdnet/utils.py:93-106)."""
    def leaf_paths(tree, path="", acc=None):
        acc = set() if acc is None else acc
        for k, v in tree.items():
            p = f"{path}{k}"
            if isinstance(v, dict):
                leaf_paths(v, p + "/", acc)
            else:
                acc.add(p)
        return acc

    paths = leaf_paths(params)
    stats_paths = leaf_paths(batch_stats or {})
    missing = []
    for key in flat:
        if "batch_stats::" in key:
            if key.replace("batch_stats::", "") not in stats_paths:
                missing.append(key)
        elif key not in paths:
            missing.append(key)
    return sorted(missing)


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


# ------------------------------------------------------------------ CLI
#
# python -m tennis_tpu.models.convert --arch densenet121 <in.pth> <out.npz>
# python -m tennis_tpu.models.convert --arch r21d --num_layers 34 <in.pkl> <out.npz>
# python -m tennis_tpu.models.convert --arch flownets <in.pth.tar> <out.npz>
#
# Source checkpoints: torchvision densenet121 state_dict (torch.load-able),
# the VMZ Caffe2 R(2+1)D pickle (reference models/vision/rdnet/utils.py:7-116
# consumed the same file), and a FlowNet2-S torch checkpoint (reference
# models/vision/flownet/README.md). The output .npz feeds ``--pretrained_npz``
# in tennis_tpu/train.py and train_gnmt.py, and FlowRunner(params_path=*.npz).


def _load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def _load_caffe2_blobs(path: str) -> dict:
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f, encoding="latin1")
    if isinstance(obj, dict) and "blobs" in obj:
        obj = obj["blobs"]
    return obj


def _verify(flat: dict, model, sample_shape) -> int:
    """Shape-checked dry-run injection into a freshly-initialized model; aborts
    on any unconsumed table key (naming/architecture mismatch)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros(sample_shape, jnp.float32)
    )
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(
        np.asarray, dict(variables.get("batch_stats", {}))
    )
    missing = unmatched_keys(params, stats, flat)
    if missing:
        raise SystemExit(
            f"conversion mismatch: {len(missing)} table keys have no "
            f"counterpart in the model, e.g. {missing[:5]}"
        )
    _, _, n = inject_npz(params, stats, flat)
    return n


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert public pretrained checkpoints to --pretrained_npz "
                    "format (flat .npz of '/'-joined flax param paths)")
    ap.add_argument("--arch", required=True,
                    choices=["densenet121", "r21d", "flownets"])
    ap.add_argument("--num_layers", type=int, default=34,
                    help="r21d depth (34 or 152)")
    ap.add_argument("input", help="source checkpoint (.pth/.pth.tar/.pkl)")
    ap.add_argument("output", help="output .npz path")
    args = ap.parse_args(argv)

    if args.arch == "densenet121":
        from tennis_tpu.models import get_backbone

        flat = convert_torch_densenet(_load_torch_state_dict(args.input))
        import jax.numpy as jnp

        model = get_backbone("densenet121", dtype=jnp.float32)
        # verify against the bare backbone (strip the backbone/ mount)
        n = _verify(rebase(flat, [""]), model, (1, 64, 64, 3))
    elif args.arch == "r21d":
        from tennis_tpu.models.r21d import get_r21d

        flat = convert_caffe2_r21d(_load_caffe2_blobs(args.input),
                                   num_layers=args.num_layers)
        # drop the Kinetics-400 head (the tennis models retrain an 11-class
        # Dense head, like the reference's FrameModel wrap of .features)
        flat = {k: v for k, v in flat.items() if not k.startswith("dense/")}
        import jax.numpy as jnp

        model = get_r21d(num_layers=args.num_layers, n_classes=400, t=8,
                         dtype=jnp.float32)
        n = _verify(flat, model, (1, 8, 32, 32, 3))
    else:
        from tennis_tpu.models.flownet import FlowNetS

        flat = convert_torch_flownets(_load_torch_state_dict(args.input))
        n = _verify(flat, FlowNetS(), (1, 2, 64, 64, 3))

    save_npz(flat, args.output)
    print(f"wrote {len(flat)} arrays ({n} verified against the model) "
          f"to {args.output}")


if __name__ == "__main__":
    main()
