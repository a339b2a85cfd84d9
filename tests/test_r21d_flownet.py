import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.models.flownet import FlowNetS
from tennis_tpu.models.flownet_run import (
    crop_to_64,
    flow_to_image,
    normalise_pair,
    read_flo,
    write_flo,
)
from tennis_tpu.models.r21d import R21D, _mid_channels, get_r21d

RNG = jax.random.PRNGKey(0)


def test_mid_channels_formula():
    # reference r21d.py:40-41 with kernel (3,3,3): M = 27*Ci*Co / (9*Ci + 3*Co)
    assert _mid_channels((3, 3, 3), 64, 64) == int(
        (27 * 64 * 64) / (9 * 64 + 3 * 64)
    )
    # stem uses a fixed mid of 45 (checked in the module, not the formula)


def test_r21d_forward_shapes():
    from tennis_tpu.models.r21d import R21DClassifier

    net = R21D(num_layers=34, num_classes=11, dtype=jnp.float32)
    x = jnp.ones((1, 4, 32, 32, 3))
    variables = net.init(RNG, x)
    feats = net.apply(variables, x)
    assert feats.shape == (1, 512)

    clf = R21DClassifier(net, num_classes=11, dtype=jnp.float32)
    cvars = clf.init(RNG, x)
    avg, sm = clf.apply(cvars, x)
    assert sm.shape == (1, 11)
    np.testing.assert_allclose(np.asarray(sm).sum(-1), 1.0, rtol=1e-5)


def test_r21d_train_updates_stats_but_not_stem(tmp_path):
    net = R21D(num_layers=34, num_classes=4, dtype=jnp.float32)
    x = jax.random.normal(RNG, (2, 4, 16, 16, 3))
    variables = net.init(RNG, x)
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]
    after = mutated["batch_stats"]
    # stem BN is frozen (use_global_stats parity)
    np.testing.assert_array_equal(
        np.asarray(before["init_bn"]["mean"]), np.asarray(after["init_bn"]["mean"])
    )
    # stage BNs do update
    assert not np.allclose(
        np.asarray(before["stage1_block1"]["bn1"]["mean"]),
        np.asarray(after["stage1_block1"]["bn1"]["mean"]),
    )


def test_r21d_remat_is_numerically_transparent():
    """--remat block on rdnet must not change params, outputs, or grads."""
    x = jax.random.normal(RNG, (2, 4, 16, 16, 3))
    plain = R21D(num_layers=34, num_classes=4, dtype=jnp.float32, remat=False)
    remat = R21D(num_layers=34, num_classes=4, dtype=jnp.float32, remat=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vr = remat.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vp) == jax.tree_util.tree_structure(vr)
    np.testing.assert_allclose(
        np.asarray(plain.apply(vp, x)), np.asarray(remat.apply(vr, x)), rtol=1e-6
    )

    def loss(params, net, stats):
        out, _ = net.apply({"params": params, "batch_stats": stats}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(out**2)

    gp = jax.grad(lambda p: loss(p, plain, vp["batch_stats"]))(vp["params"])
    gr = jax.grad(lambda p: loss(p, remat, vr["batch_stats"]))(vr["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_get_r21d_asserts():
    with pytest.raises(AssertionError):
        get_r21d(num_layers=50)
    with pytest.raises(AssertionError):
        get_r21d(t=16)


def test_flownet_pyramid_shapes():
    net = FlowNetS(dtype=jnp.float32)
    x = jnp.ones((1, 2, 64, 128, 3))
    variables = net.init(RNG, x)
    flow = net.apply(variables, x)
    assert flow.shape == (1, 16, 32, 2)  # quarter res of the /64-cropped input
    flows = net.apply(variables, x, train=True)
    assert len(flows) == 5
    assert flows[0].shape == (1, 16, 32, 2)
    assert flows[4].shape == (1, 1, 2, 2)


def test_crop_and_normalise():
    img = np.zeros((100, 130, 3), np.uint8)
    c = crop_to_64(img)
    assert c.shape == (64, 128, 3)
    pair = np.stack([np.full((64, 64, 3), 100, np.uint8),
                     np.full((64, 64, 3), 200, np.uint8)])
    n = normalise_pair(pair)
    assert n.dtype == np.float32
    np.testing.assert_allclose(n.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(n[1] - n[0], 100 / 255.0, rtol=1e-5)


def test_flow_to_image_properties():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 1.0   # rightward motion top half
    flow[4:, 1] = -1.0
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # distinct motions → distinct colours
    assert not np.array_equal(img[0, 0], img[7, 7])


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(size=(6, 9, 2)).astype(np.float32)
    path = str(tmp_path / "test.flo")
    write_flo(path, flow)
    back = read_flo(path)
    np.testing.assert_allclose(back, flow, rtol=1e-6)


def test_generate_flows_tree(tmp_path):
    import cv2

    from tennis_tpu.models.flownet_run import generate_flows

    frames = tmp_path / "frames" / "V1.mp4" / "0000000000"
    os.makedirs(frames)
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(frames / f"{i:010d}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    generate_flows(str(tmp_path / "frames"), str(tmp_path / "flow"), batch_size=2)
    out = tmp_path / "flow" / "V1.mp4" / "0000000000"
    files = sorted(os.listdir(out))
    # frame 0 skipped (no predecessor); frames 1-3 produced
    assert files == ["0000000001.jpg", "0000000002.jpg", "0000000003.jpg"]
    img = cv2.imread(str(out / files[0]))
    assert img.shape == (64, 64, 3)  # 16×16 flow upscaled 4×
