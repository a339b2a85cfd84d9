"""Golden-activation tests for the pretrained-weight converters.

Round-1 converter tests were schema-only (shapes/names). These run the SAME
source-format weights through (a) an independent torch functional forward that
follows the source zoo's published layer semantics and (b) our converted flax
model, and require the activations to agree — guarding the known BN-semantics
traps (reference models/vision/rdnet/README.md "Minor Differences": eps,
running-stat conventions, Caffe2 ``_riv`` naming) and the conv/deconv kernel
layout transposes.

Weights are generated in-test from seeded numpy (variance-scaled so activations
stay bounded through 121 layers) — no fixture files, fully deterministic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tennis_tpu.models.convert import (  # noqa: E402
    convert_caffe2_r21d,
    convert_torch_densenet,
    convert_torch_flownets,
    inject_npz,
)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _close(ours, gold, tol, what):
    ours, gold = np.asarray(ours), np.asarray(gold)
    scale = max(float(np.abs(gold).max()), 1e-3)
    diff = float(np.abs(ours - gold).max()) / scale
    assert diff < tol, f"{what}: max rel-to-peak diff {diff:.2e} >= {tol}"


# --------------------------------------------------------------- DenseNet121


def _gen_densenet_state(rng):
    """torchvision densenet121 schema, variance-scaled random values."""
    sd = {}

    def conv(name, o, i, k):
        fan = i * k * k
        sd[name] = (rng.standard_normal((o, i, k, k)) / np.sqrt(fan)).astype(
            np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.8, 1.2, c).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        sd[f"{name}.running_mean"] = (rng.standard_normal(c) * 0.05).astype(
            np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.8, 1.2, c).astype(np.float32)

    conv("features.conv0.weight", 64, 3, 7)
    bn("features.norm0", 64)
    growth, bn_size, c = 32, 4, 64
    for b, n_layers in enumerate([6, 12, 24, 16], start=1):
        for l in range(1, n_layers + 1):
            in_c = c + (l - 1) * growth
            p = f"features.denseblock{b}.denselayer{l}"
            bn(f"{p}.norm1", in_c)
            conv(f"{p}.conv1.weight", bn_size * growth, in_c, 1)
            bn(f"{p}.norm2", bn_size * growth)
            conv(f"{p}.conv2.weight", growth, bn_size * growth, 3)
        c += n_layers * growth
        if b < 4:
            bn(f"features.transition{b}.norm", c)
            conv(f"features.transition{b}.conv.weight", c // 2, c, 1)
            c //= 2
    bn("features.norm5", c)
    return sd


def _torch_densenet_forward(sd, x_nchw):
    """torchvision densenet121 eval forward (features path + our fixed-k pool)."""

    def bn(x, p):
        return F.batch_norm(x, _t(sd[f"{p}.running_mean"]),
                            _t(sd[f"{p}.running_var"]), _t(sd[f"{p}.weight"]),
                            _t(sd[f"{p}.bias"]), False, 0.0, 1e-5)

    x = _t(x_nchw)
    x = F.conv2d(x, _t(sd["features.conv0.weight"]), stride=2, padding=3)
    x = F.max_pool2d(F.relu(bn(x, "features.norm0")), 3, 2, 1)
    for b, n_layers in enumerate([6, 12, 24, 16], start=1):
        feats = [x]
        for l in range(1, n_layers + 1):
            p = f"features.denseblock{b}.denselayer{l}"
            h = torch.cat(feats, 1)
            h = F.conv2d(F.relu(bn(h, f"{p}.norm1")), _t(sd[f"{p}.conv1.weight"]))
            h = F.conv2d(F.relu(bn(h, f"{p}.norm2")), _t(sd[f"{p}.conv2.weight"]),
                         padding=1)
            feats.append(h)
        x = torch.cat(feats, 1)
        if b < 4:
            p = f"features.transition{b}"
            x = F.conv2d(F.relu(bn(x, f"{p}.norm")), _t(sd[f"{p}.conv.weight"]))
            x = F.avg_pool2d(x, 2, 2)
    x = F.relu(bn(x, "features.norm5"))
    k = min(7, x.shape[2])
    x = F.avg_pool2d(x, k, k)
    return x.flatten(1).numpy()


def test_densenet_converted_activations_match_torch():
    from tennis_tpu.models import get_backbone

    rng = np.random.default_rng(0)
    sd = _gen_densenet_state(rng)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    gold = _torch_densenet_forward(sd, np.transpose(x, (0, 3, 1, 2)))

    net = get_backbone("densenet121", dtype=jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    flat = {k.replace("backbone/", ""): v
            for k, v in convert_torch_densenet(sd).items()}
    params, stats, n = inject_npz(params, stats, flat)
    assert n == len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(stats))

    ours = jax.jit(net.apply)({"params": params, "batch_stats": stats}, x)
    assert ours.shape == gold.shape
    _close(ours, gold, 1e-3, "densenet121 features")


# --------------------------------------------------------------- R(2+1)D-34


def _gen_r21d_blobs(rng):
    """VMZ caffe2 blob dict for R(2+1)D-34, variance-scaled random values."""
    from tennis_tpu.models.r21d import _mid_channels

    blobs = {}

    def conv(name, o, i, kd, kh, kw):
        fan = i * kd * kh * kw
        blobs[name] = (rng.standard_normal((o, i, kd, kh, kw))
                       / np.sqrt(fan)).astype(np.float32)

    def bn(name, c):
        blobs[name + "_s"] = rng.uniform(0.8, 1.2, c).astype(np.float32)
        blobs[name + "_b"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        blobs[name + "_rm"] = (rng.standard_normal(c) * 0.05).astype(np.float32)
        blobs[name + "_riv"] = rng.uniform(0.8, 1.2, c).astype(np.float32)

    conv("conv1_middle_w", 45, 3, 1, 7, 7)
    bn("conv1_middle_spatbn_relu", 45)
    conv("conv1_w", 64, 45, 3, 1, 1)
    bn("conv1_spatbn_relu", 64)

    layers, channels = (3, 4, 6, 3), (64, 64, 128, 256, 512)
    comp, in_c = 0, 64
    for stage, num_blocks in enumerate(layers, start=1):
        c = channels[stage]
        for block in range(1, num_blocks + 1):
            stride = 2 if (stage > 1 and block == 1) else 1
            cin = in_c if block == 1 else c
            for j, c_in_j in ((1, cin), (2, c)):
                mid = _mid_channels((3, 3, 3), c_in_j, c)
                conv(f"comp_{comp}_conv_{j}_middle_w", mid, c_in_j, 1, 3, 3)
                bn(f"comp_{comp}_spatbn_{j}_middle", mid)
                conv(f"comp_{comp}_conv_{j}_w", c, mid, 3, 1, 1)
                bn(f"comp_{comp}_spatbn_{j}", c)
            if block == 1 and (stride != 1 or cin != c):
                conv(f"shortcut_projection_{comp}_w", c, cin, 1, 1, 1)
                bn(f"shortcut_projection_{comp}_spatbn", c)
            comp += 1
        in_c = c
    return blobs


def _torch_r21d_forward(blobs, x_ncdhw):
    """VMZ R(2+1)D-34 eval forward: spatial→BN→relu→temporal factored convs,
    eps 1e-3 BNs, frozen stem stats, global pool."""

    def bn(x, name):
        return F.batch_norm(x, _t(blobs[name + "_rm"]), _t(blobs[name + "_riv"]),
                            _t(blobs[name + "_s"]), _t(blobs[name + "_b"]),
                            False, 0.0, 1e-3)

    def conv(x, w, stride, pad):
        return F.conv3d(x, _t(w), stride=stride, padding=pad)

    x = _t(x_ncdhw)
    x = conv(x, blobs["conv1_middle_w"], (1, 2, 2), (0, 3, 3))
    x = F.relu(bn(x, "conv1_middle_spatbn_relu"))
    x = conv(x, blobs["conv1_w"], (1, 1, 1), (1, 0, 0))
    x = F.relu(bn(x, "conv1_spatbn_relu"))

    layers = (3, 4, 6, 3)
    comp, in_c = 0, 64
    channels = (64, 64, 128, 256, 512)
    for stage, num_blocks in enumerate(layers, start=1):
        c = channels[stage]
        for block in range(1, num_blocks + 1):
            stride = 2 if (stage > 1 and block == 1) else 1
            res = x
            h = x
            for j, s in ((1, stride), (2, 1)):
                h = conv(h, blobs[f"comp_{comp}_conv_{j}_middle_w"],
                         (1, s, s), (0, 1, 1))
                h = F.relu(bn(h, f"comp_{comp}_spatbn_{j}_middle"))
                h = conv(h, blobs[f"comp_{comp}_conv_{j}_w"], (s, 1, 1),
                         (1, 0, 0))
                h = bn(h, f"comp_{comp}_spatbn_{j}")
                if j == 1:
                    h = F.relu(h)
            if f"shortcut_projection_{comp}_w" in blobs:
                res = conv(res, blobs[f"shortcut_projection_{comp}_w"],
                           (stride,) * 3, 0)
                res = bn(res, f"shortcut_projection_{comp}_spatbn")
            x = F.relu(h + res)
            comp += 1
        in_c = c
    return x.mean(dim=(2, 3, 4)).numpy()


def test_r21d_converted_activations_match_torch():
    from tennis_tpu.models.r21d import R21D

    rng = np.random.default_rng(1)
    blobs = _gen_r21d_blobs(rng)
    x = rng.standard_normal((1, 4, 32, 32, 3)).astype(np.float32)

    gold = _torch_r21d_forward(blobs, np.transpose(x, (0, 4, 1, 2, 3)))

    net = R21D(num_layers=34, dtype=jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.ones((1, 4, 32, 32, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    params, stats, n = inject_npz(params, stats, convert_caffe2_r21d(blobs))
    assert n == len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(stats))

    ours = jax.jit(net.apply)({"params": params, "batch_stats": stats}, x)
    assert ours.shape == gold.shape
    _close(ours, gold, 1e-3, "r21d-34 pooled features")


# --------------------------------------------------------------- FlowNet-S


_FN_CONVS = {  # name: (out, in, k, stride)
    "conv1.0": (64, 6, 7, 2), "conv2.0": (128, 64, 5, 2),
    "conv3.0": (256, 128, 5, 2), "conv3_1.0": (256, 256, 3, 1),
    "conv4.0": (512, 256, 3, 2), "conv4_1.0": (512, 512, 3, 1),
    "conv5.0": (512, 512, 3, 2), "conv5_1.0": (512, 512, 3, 1),
    "conv6.0": (1024, 512, 3, 2), "conv6_1.0": (1024, 1024, 3, 1),
    "predict_flow6": (2, 1024, 3, 1), "predict_flow5": (2, 1026, 3, 1),
    "predict_flow4": (2, 770, 3, 1), "predict_flow3": (2, 386, 3, 1),
    "predict_flow2": (2, 194, 3, 1),
}
_FN_DECONVS = {  # name: (in, out) — torch ConvTranspose weight is (in, out, 4, 4)
    "deconv5.0": (1024, 512), "deconv4.0": (1026, 256), "deconv3.0": (770, 128),
    "deconv2.0": (386, 64),
    "upsampled_flow6_to_5": (2, 2), "upsampled_flow5_to_4": (2, 2),
    "upsampled_flow4_to_3": (2, 2), "upsampled_flow3_to_2": (2, 2),
}


def _gen_flownet_state(rng):
    sd = {}
    for name, (o, i, k, _s) in _FN_CONVS.items():
        sd[f"{name}.weight"] = (rng.standard_normal((o, i, k, k))
                                / np.sqrt(i * k * k)).astype(np.float32)
        sd[f"{name}.bias"] = (rng.standard_normal(o) * 0.05).astype(np.float32)
    for name, (i, o) in _FN_DECONVS.items():
        sd[f"{name}.weight"] = (rng.standard_normal((i, o, 4, 4))
                                / np.sqrt(i * 16)).astype(np.float32)
        if name.startswith("deconv"):
            sd[f"{name}.bias"] = (rng.standard_normal(o) * 0.05).astype(
                np.float32)
    return sd


def _torch_flownet_forward(sd, x_nchw):
    def L(x):
        return F.leaky_relu(x, 0.1)

    def conv(x, name):
        _o, _i, k, s = _FN_CONVS[name]
        return F.conv2d(x, _t(sd[f"{name}.weight"]), _t(sd[f"{name}.bias"]),
                        stride=s, padding=k // 2)

    def deconv(x, name):
        b = sd.get(f"{name}.bias")
        return F.conv_transpose2d(x, _t(sd[f"{name}.weight"]),
                                  _t(b) if b is not None else None,
                                  stride=2, padding=1)

    x = _t(x_nchw)
    out1 = L(conv(x, "conv1.0"))
    out2 = L(conv(out1, "conv2.0"))
    out3 = L(conv(L(conv(out2, "conv3.0")), "conv3_1.0"))
    out4 = L(conv(L(conv(out3, "conv4.0")), "conv4_1.0"))
    out5 = L(conv(L(conv(out4, "conv5.0")), "conv5_1.0"))
    out6 = L(conv(L(conv(out5, "conv6.0")), "conv6_1.0"))

    flow6 = conv(out6, "predict_flow6")
    concat5 = torch.cat([out5, L(deconv(out6, "deconv5.0")),
                         deconv(flow6, "upsampled_flow6_to_5")], 1)
    flow5 = conv(concat5, "predict_flow5")
    concat4 = torch.cat([out4, L(deconv(concat5, "deconv4.0")),
                         deconv(flow5, "upsampled_flow5_to_4")], 1)
    flow4 = conv(concat4, "predict_flow4")
    concat3 = torch.cat([out3, L(deconv(concat4, "deconv3.0")),
                         deconv(flow4, "upsampled_flow4_to_3")], 1)
    flow3 = conv(concat3, "predict_flow3")
    concat2 = torch.cat([out2, L(deconv(concat3, "deconv2.0")),
                         deconv(flow3, "upsampled_flow3_to_2")], 1)
    flow2 = conv(concat2, "predict_flow2")
    return [f.numpy() for f in (flow2, flow3, flow4, flow5, flow6)]


def test_flownets_converted_activations_match_torch():
    from tennis_tpu.models.flownet import FlowNetS

    rng = np.random.default_rng(2)
    sd = _gen_flownet_state(rng)
    x = rng.standard_normal((1, 128, 128, 6)).astype(np.float32)

    gold = _torch_flownet_forward(sd, np.transpose(x, (0, 3, 1, 2)))

    net = FlowNetS(dtype=jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.ones((1, 128, 128, 6)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params, _, n = inject_npz(params, {}, convert_torch_flownets(sd))
    assert n == len(jax.tree_util.tree_leaves(params))

    flows = jax.jit(lambda p, x: net.apply({"params": p}, x, train=True))(
        params, x)

    # with symmetric encoder padding and flipped deconv kernels the whole
    # pyramid matches torch exactly (borders included at these even sizes)
    for ours, g, name in zip(flows, gold,
                             ("flow2", "flow3", "flow4", "flow5", "flow6")):
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        assert ours.shape == g.shape
        _close(ours, g, 1e-4, name)
