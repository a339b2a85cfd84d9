import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.models import get_backbone
from tennis_tpu.models.convert import (
    convert_torch_densenet,
    convert_torch_flownets,
    inject_npz,
)


def _fake_torch_densenet_state():
    """torchvision densenet121 key schema with correctly-shaped random arrays."""
    rng = np.random.default_rng(0)
    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, size=(c,)).astype(
            np.float32
        )

    sd["features.conv0.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(
        np.float32
    )
    bn("features.norm0", 64)

    growth, bn_size = 32, 4
    c = 64
    for b, n_layers in enumerate([6, 12, 24, 16], start=1):
        for l in range(1, n_layers + 1):
            in_c = c + (l - 1) * growth
            p = f"features.denseblock{b}.denselayer{l}"
            bn(f"{p}.norm1", in_c)
            sd[f"{p}.conv1.weight"] = rng.normal(
                size=(bn_size * growth, in_c, 1, 1)
            ).astype(np.float32)
            bn(f"{p}.norm2", bn_size * growth)
            sd[f"{p}.conv2.weight"] = rng.normal(
                size=(growth, bn_size * growth, 3, 3)
            ).astype(np.float32)
        c += n_layers * growth
        if b < 4:
            bn(f"features.transition{b}.norm", c)
            sd[f"features.transition{b}.conv.weight"] = rng.normal(
                size=(c // 2, c, 1, 1)
            ).astype(np.float32)
            c //= 2
    bn("features.norm5", c)
    return sd


def test_densenet_converter_covers_every_param():
    sd = _fake_torch_densenet_state()
    flat = convert_torch_densenet(sd)

    net = get_backbone("densenet121", dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    n_params = len(jax.tree_util.tree_leaves(params))
    n_stats = len(jax.tree_util.tree_leaves(stats))
    # converter keys use the train.py 'backbone/' prefix; strip for a bare net
    flat = {k.replace("backbone/", ""): v for k, v in flat.items()}
    params, stats, n = inject_npz(params, stats, flat)
    assert n == n_params + n_stats, f"loaded {n} of {n_params + n_stats}"

    # spot-check the transpose: conv0 kernel HWIO == torch OIHW transposed
    np.testing.assert_allclose(
        params["conv0"]["kernel"],
        np.transpose(sd["features.conv0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        stats["bn0"]["mean"], sd["features.norm0.running_mean"]
    )

    # deep-path spot check: last block's last layer conv2
    np.testing.assert_allclose(
        params["block3_layer15"]["conv2"]["kernel"],
        np.transpose(
            sd["features.denseblock4.denselayer16.conv2.weight"], (2, 3, 1, 0)
        ),
    )
    # (no forward check: random fake "pretrained" weights explode numerically
    # through 121 layers; forward sanity is covered by the backbone tests)


def test_flownet_converter_covers_every_param():
    from tennis_tpu.models.flownet import FlowNetS

    net = FlowNetS(dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    # fabricate a torch state dict whose shapes invert our layout
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
                size=params[dst]["bias"].shape
            ).astype(np.float32)

    flat = convert_torch_flownets(sd)
    params, _, n = inject_npz(params, {}, flat)
    assert n == len(jax.tree_util.tree_leaves(params))
    out = net.apply({"params": params}, jnp.ones((1, 2, 64, 64, 3)))
    assert out.shape == (1, 16, 16, 2)
