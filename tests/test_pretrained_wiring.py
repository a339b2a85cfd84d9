"""Pretrained-weight delivery for every model family (reference train.py:199-214:
backbone AND flow_net load the pretrained zoo; rdnet loads converted Caffe2
weights; train_gnmt.py:149-151 builds a pretrained CNN src_embed).

Covers the converter CLI (python -m tennis_tpu.models.convert), the
mount-rebasing injection (TwoStream / wrapped FrameModel / rdnet), and the
FlowRunner .npz path.
"""
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.models import (
    CNNRNN, FrameModel, TemporalPooling, TwoStreamModel, get_backbone,
)
from tennis_tpu.models.convert import (
    convert_torch_densenet, convert_torch_flownets, inject_npz, rebase,
    unmatched_keys,
)
from test_convert import _fake_torch_densenet_state
from test_convert_golden import _gen_r21d_blobs


def test_rebase_marker_and_root():
    flat = {
        "backbone/conv0/kernel": np.zeros(1),
        "backbone/batch_stats::bn0/mean": np.ones(1),
    }
    out = rebase(flat, ["model_rgb", "model_flow"])
    assert set(out) == {
        "model_rgb/conv0/kernel", "model_flow/conv0/kernel",
        "batch_stats::model_rgb/bn0/mean", "batch_stats::model_flow/bn0/mean",
    }
    # tables without the root prefix (r21d converter) just gain the mount
    out = rebase({"init/spatial/kernel": np.zeros(1)}, ["backbone"])
    assert set(out) == {"backbone/init/spatial/kernel"}


def test_two_stream_both_streams_pretrained():
    """Both streams start from the converted table, like the reference's
    pretrained backbone_net + flow_net (train.py:199-209)."""
    flat = convert_torch_densenet(_fake_torch_densenet_state())

    model = TwoStreamModel(
        get_backbone("densenet121", dtype=jnp.float32),
        get_backbone("densenet121", dtype=jnp.float32),
        num_classes=11, dtype=jnp.float32,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.ones((1, 32, 32, 6)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    per_stream = (
        len(jax.tree_util.tree_leaves(params["model_rgb"]))
        + len(jax.tree_util.tree_leaves(stats["model_rgb"]))
    )

    table = rebase(flat, ["model_rgb", "model_flow"])
    assert not unmatched_keys(params, stats, table)
    params, stats, n = inject_npz(params, stats, table)
    assert n == 2 * per_stream

    want = np.transpose(
        _fake_torch_densenet_state()["features.conv0.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(params["model_rgb"]["conv0"]["kernel"], want)
    np.testing.assert_allclose(params["model_flow"]["conv0"]["kernel"], want)


def test_wrapped_frame_model_mount():
    """CNNRNN/TemporalPooling over pixels mount at model/backbone."""
    flat = convert_torch_densenet(_fake_torch_densenet_state())
    base = FrameModel(get_backbone("densenet121", dtype=jnp.float32),
                      dtype=jnp.float32)
    model = TemporalPooling(model=base, num_classes=11, pool="max",
                            dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.ones((1, 2, 32, 32, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    n_back = (
        len(jax.tree_util.tree_leaves(params["model"]["backbone"]))
        + len(jax.tree_util.tree_leaves(stats["model"]["backbone"]))
    )

    table = rebase(flat, ["model/backbone"])
    assert not unmatched_keys(params, stats, table)
    _, _, n = inject_npz(params, stats, table)
    assert n == n_back


def test_pretrained_mounts_selector():
    from tennis_tpu.train import _pretrained_mounts

    dn = lambda: get_backbone("densenet121", dtype=jnp.float32)
    assert _pretrained_mounts(FrameModel(dn(), 11)) == ["backbone"]
    assert _pretrained_mounts(
        TwoStreamModel(dn(), dn(), 11)) == ["model_flow", "model_rgb"]
    assert _pretrained_mounts(
        TwoStreamModel(None, dn(), 11)) == ["model_flow"]
    base = FrameModel(dn(), dtype=jnp.float32)
    assert _pretrained_mounts(
        CNNRNN(model=base, num_classes=11)) == ["model/backbone"]
    assert _pretrained_mounts(
        TemporalPooling(model=base, num_classes=11)) == ["model/backbone"]
    # feats-mode temporal models have no pixel backbone to pretrain
    assert _pretrained_mounts(CNNRNN(model=None, num_classes=11)) == []


def _run_cli(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "tennis_tpu.models.convert", *args],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_converter_cli_densenet(tmp_path):
    import torch

    src = tmp_path / "dn121.pth"
    out = tmp_path / "dn121.npz"
    torch.save({k: torch.from_numpy(v)
                for k, v in _fake_torch_densenet_state().items()}, src)
    r = _run_cli(["--arch", "densenet121", str(src), str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    flat = dict(np.load(out))
    assert "backbone/conv0/kernel" in flat
    assert any("batch_stats::" in k for k in flat)


def test_converter_cli_r21d(tmp_path):
    src = tmp_path / "r21d.pkl"
    out = tmp_path / "r21d.npz"
    blobs = _gen_r21d_blobs(np.random.default_rng(0))
    # the real VMZ pickle carries a Kinetics head; the CLI must drop it
    blobs["last_out_L400_w"] = np.zeros((400, 512), np.float32)
    blobs["last_out_L400_b"] = np.zeros((400,), np.float32)
    with open(src, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    r = _run_cli(["--arch", "r21d", "--num_layers", "34", str(src), str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    flat = dict(np.load(out))
    assert "init/spatial/kernel" in flat
    assert not any(k.startswith("dense/") for k in flat)
    # mountable under a FrameModel wrap (the --backbone rdnet composition)
    assert "backbone/init/spatial/kernel" in rebase(flat, ["backbone"])


def test_r21d_152_bottleneck_conversion_covers_every_param():
    """The 152-layer bottleneck layout (conv_1/conv_3 plain, only the middle
    factorized) maps completely — the reference converter handles 152 via its
    rename table incl. stage1_block1's shortcut (utils.py:51-54)."""
    from tennis_tpu.models.convert import convert_caffe2_r21d
    from tennis_tpu.models.r21d import R21D, R21D_SPECS

    net = R21D(num_layers=152, dtype=jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.ones((1, 4, 16, 16, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    # build a synthetic caffe2 blob dict by inverting the name/shape mapping
    rng = np.random.default_rng(0)
    blobs = {}

    def inv3d(kern):  # flax DHWIO -> caffe2 OIDHW
        return rng.normal(size=np.transpose(kern, (4, 3, 0, 1, 2)).shape
                          ).astype(np.float32)

    def inv_bn(tree_p, tree_s, src):
        c = tree_p["scale"].shape
        blobs[src + "_s"] = rng.normal(size=c).astype(np.float32)
        blobs[src + "_b"] = rng.normal(size=c).astype(np.float32)
        blobs[src + "_rm"] = rng.normal(size=c).astype(np.float32)
        blobs[src + "_riv"] = rng.uniform(0.5, 2, size=c).astype(np.float32)

    blobs["conv1_middle_w"] = inv3d(params["init"]["spatial"]["kernel"])
    inv_bn(params["init"]["bn"], stats["init"]["bn"], "conv1_middle_spatbn_relu")
    blobs["conv1_w"] = inv3d(params["init"]["temporal"]["kernel"])
    inv_bn(params["init_bn"], stats["init_bn"], "conv1_spatbn_relu")

    _, layers, _ = R21D_SPECS[152]
    comp = 0
    for stage, num_blocks in enumerate(layers, start=1):
        for block in range(1, num_blocks + 1):
            d = params[f"stage{stage}_block{block}"]
            ds = stats[f"stage{stage}_block{block}"]
            blobs[f"comp_{comp}_conv_1_w"] = inv3d(d["conv1"]["kernel"])
            inv_bn(d["bn1"], ds["bn1"], f"comp_{comp}_spatbn_1")
            blobs[f"comp_{comp}_conv_2_middle_w"] = inv3d(
                d["conv2"]["spatial"]["kernel"])
            inv_bn(d["conv2"]["bn"], ds["conv2"]["bn"],
                   f"comp_{comp}_spatbn_2_middle")
            blobs[f"comp_{comp}_conv_2_w"] = inv3d(d["conv2"]["temporal"]["kernel"])
            inv_bn(d["bn2"], ds["bn2"], f"comp_{comp}_spatbn_2")
            blobs[f"comp_{comp}_conv_3_w"] = inv3d(d["conv3"]["kernel"])
            inv_bn(d["bn3"], ds["bn3"], f"comp_{comp}_spatbn_3")
            if "down" in d:
                blobs[f"shortcut_projection_{comp}_w"] = inv3d(d["down"]["kernel"])
                inv_bn(d["down_bn"], ds["down_bn"],
                       f"shortcut_projection_{comp}_spatbn")
            comp += 1

    flat = convert_caffe2_r21d(blobs, num_layers=152)
    assert not unmatched_keys(params, stats, flat)
    n_all = (len(jax.tree_util.tree_leaves(params))
             + len(jax.tree_util.tree_leaves(stats)))
    _, _, n = inject_npz(params, stats, flat)
    assert n == n_all, f"covered {n} of {n_all}"


def test_flow_runner_npz(tmp_path):
    from tennis_tpu.models.flownet import FlowNetS
    from tennis_tpu.models.flownet_run import FlowRunner

    net = FlowNetS(dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    rng = np.random.default_rng(1)
    from tennis_tpu.models.convert import _FLOWNET_MAP

    sd = {}
    for src, dst in _FLOWNET_MAP.items():
        kern = params[dst]["kernel"]
        h, w, a, b = kern.shape
        if dst.startswith(("deconv", "upflow")):
            sd[f"{src}.weight"] = rng.normal(size=(a, b, h, w)).astype(np.float32)
        else:
            sd[f"{src}.weight"] = rng.normal(size=(b, a, h, w)).astype(np.float32)
        if "bias" in params[dst]:
            sd[f"{src}.bias"] = rng.normal(
                size=params[dst]["bias"].shape).astype(np.float32) * 0.01

    npz = tmp_path / "flownets.npz"
    np.savez(npz, **convert_torch_flownets(sd))
    runner = FlowRunner(params_path=str(npz), batch_size=2)
    # converted weights actually landed (not the random init)
    got = np.asarray(runner.variables["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(sd["conv1.0.weight"], (2, 3, 1, 0)))
    flow = runner.flow_batch(
        rng.integers(0, 255, (1, 2, 64, 64, 3), dtype=np.uint8).astype(np.uint8))
    assert flow.shape == (1, 16, 16, 2) and np.isfinite(flow).all()
