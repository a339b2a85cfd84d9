import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.models import (
    CNNRNN,
    Debug,
    FrameModel,
    TemporalPooling,
    TwoStreamModel,
    backbone_feature_dim,
    get_backbone,
)

# small inputs keep CPU tests fast; feature dims follow the same formulas as 512²
RNG = jax.random.PRNGKey(0)


def test_backbone_feature_dims():
    assert backbone_feature_dim("DenseNet121", 512) == 4096  # the reference feat width
    assert backbone_feature_dim("DenseNet121", 224) == 1024
    assert backbone_feature_dim("resnet18_v2", 512) == 512
    assert backbone_feature_dim("resnet50_v2", 224) == 2048


def test_densenet_forward_shape():
    # 64² input → 2×2 final map → global-ish pool → (1, 1024); the 4096-d case at
    # 512² is covered by backbone_feature_dim and exercised on TPU in bench.py
    net = get_backbone("densenet121", dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (1, 1024)


def test_resnet18_forward_shape_and_train_stats():
    net = get_backbone("resnet18_v2", dtype=jnp.float32)
    x = jax.random.normal(RNG, (2, 64, 64, 3))
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (2, 512)
    # train mode must update batch stats
    y2, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y2.shape == (2, 512)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_frame_model_head():
    net = FrameModel(get_backbone("resnet18_v2", dtype=jnp.float32), num_classes=11,
                     dtype=jnp.float32)
    x = jnp.ones((2, 64, 64, 3))
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (2, 11) and y.dtype == jnp.float32


def test_temporal_pooling_feats_mode():
    net = TemporalPooling(model=None, num_classes=11, pool="max", feats=True,
                          dtype=jnp.float32)
    x = jax.random.normal(RNG, (2, 5, 32))
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (2, 11)
    # max pooling: invariant to time-axis permutation
    perm = x[:, ::-1]
    y2 = net.apply(variables, perm)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)


def test_temporal_pooling_mean():
    net = TemporalPooling(model=None, num_classes=0, pool="mean", feats=True,
                          dtype=jnp.float32)
    x = jnp.stack([jnp.zeros((2, 8)), jnp.ones((2, 8)) * 2], axis=1)
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)


def test_temporal_pooling_wrap_head():
    """wrap_head = the reference's TemporalPooling(num_classes=0) mode: pool
    the wrapped FrameModel's BACKBONE features over time, then its own trained
    head (definitions.py:52-55) — the drivers' temp-pool final-test path."""
    from tennis_tpu.models import get_backbone

    inner = FrameModel(get_backbone("resnet18_v2", dtype=jnp.float32), 11,
                       dtype=jnp.float32)
    v = jax.jit(inner.init)(RNG, jnp.ones((1, 32, 32, 3)))
    x = jax.random.normal(RNG, (2, 3, 32, 32, 3))

    tp = TemporalPooling(model=inner, pool="max", wrap_head=True)
    # the drivers re-root the donor's bare FrameModel tree under 'model'
    out = tp.apply({"params": {"model": v["params"]},
                    "batch_stats": {"model": v["batch_stats"]}}, x, train=False)
    B, T = x.shape[:2]
    f = inner.apply(v, x.reshape((B * T,) + x.shape[2:]), train=False,
                    method=inner.features).reshape(B, T, -1)
    want = inner.apply(v, jnp.max(f, axis=1), method=inner.head)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
    # mean differs from pooling LOGITS only for max; mean matches (linear head)
    tp_mean = TemporalPooling(model=inner, pool="mean", feats=True,
                              wrap_head=True)
    feats = jax.random.normal(RNG, (2, 4, 512))
    out_f = tp_mean.apply({"params": {"model": v["params"]},
                           "batch_stats": {"model": v["batch_stats"]}}, feats,
                          train=False)
    want_f = inner.apply(v, jnp.mean(feats, axis=1), method=inner.head)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(want_f),
                               rtol=1e-5, atol=1e-5)


def test_cnnrnn_feats_mode():
    net = CNNRNN(model=None, num_classes=11, hidden_size=16, dtype=jnp.float32)
    x = jax.random.normal(RNG, (2, 7, 32))
    variables = net.init(RNG, x)
    y = jax.jit(lambda v, x: net.apply(v, x))(variables, x)
    assert y.shape == (2, 11)


def test_cnnrnn_end_to_end_with_backbone():
    backbone = get_backbone("resnet18_v2", dtype=jnp.float32)
    net = CNNRNN(model=backbone, num_classes=5, hidden_size=8, dtype=jnp.float32)
    x = jnp.ones((1, 3, 32, 32, 3))
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (1, 5)


def test_two_stream_split():
    rgb = get_backbone("resnet18_v2", dtype=jnp.float32)
    flow = get_backbone("resnet18_v2", dtype=jnp.float32)
    net = TwoStreamModel(rgb, flow, num_classes=11, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 6))
    variables = net.init(RNG, x)
    y = net.apply(variables, x)
    assert y.shape == (1, 11)


def test_two_stream_flow_only():
    flow = get_backbone("resnet18_v2", dtype=jnp.float32)
    net = TwoStreamModel(None, flow, num_classes=11, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 6))
    variables = net.init(RNG, x)
    assert net.apply(variables, x).shape == (1, 11)


def test_debug_through_time_distributed():
    """The reference's own smoke: TimeDistributed(Debug) forward + backward with
    an L2 loss on a ones tensor (reference definitions.py:156-168; input there
    is NCHW (3,2,3,2,2) → here NHWC (3,2,2,2,3), output (3,2,1,1,4))."""
    from tennis_tpu.models import TimeDistributed

    td = TimeDistributed(Debug())
    x = jnp.ones((3, 2, 2, 2, 3))
    variables = td.init(RNG, x)
    out = td.apply(variables, x)
    assert out.shape == (3, 2, 1, 1, 4)
    assert bool(jnp.all(out >= 0))  # relu output

    def loss_fn(params):
        y = td.apply({"params": params}, x)
        return 0.5 * jnp.mean(jnp.sum((y - 1.0) ** 2, axis=(2, 3, 4)))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_print_time_logs():
    import logging as pylogging

    from absl import logging as absl_logging

    from tennis_tpu.utils import print_time

    # capture on absl's own logger directly — caplog relies on root-logger
    # propagation, which earlier driver tests (setup_logging/absl handlers)
    # can disable, making this test order-dependent in the full suite
    records = []

    class Grab(pylogging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = absl_logging.get_absl_logger()
    h = Grab(level=pylogging.INFO)
    old_level = logger.level
    logger.addHandler(h)
    logger.setLevel(pylogging.INFO)
    try:
        with print_time("do a thing"):
            pass
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)
    text = "\n".join(records)
    assert "Starting to do a thing" in text
    assert "Finished to do a thing in" in text
