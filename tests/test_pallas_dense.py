"""Fused dense-layer Pallas kernel vs the XLA DenseNet graph (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.models.backbones.densenet import DenseNet, DenseNetSpec
from tennis_tpu.ops.pallas.dense_block import densenet_features_pallas

# block-final widths 128/128 (MXU-aligned), bottleneck width 4*32=128 — the
# kernel's structural assumptions at a compile-friendly test size
SPEC = DenseNetSpec((2, 2), growth_rate=32, num_init_features=64, bn_size=4)


def _variables(rng, x):
    model = DenseNet(SPEC, dtype=jnp.float32)
    variables = jax.jit(model.init)(rng, x)
    # perturb BN stats away from (0, 1) so the folded affine is non-trivial
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    stats = jax.tree_util.tree_map_with_path(
        lambda path, v: (
            jax.random.uniform(jax.random.fold_in(k1, len(str(path))),
                               v.shape, minval=0.5, maxval=2.0)
            if str(path[-1].key) == "var"
            else jax.random.normal(jax.random.fold_in(k2, len(str(path))),
                                   v.shape) * 0.1
        ),
        variables["batch_stats"],
    )
    return {"params": variables["params"], "batch_stats": stats}, model


def test_pallas_features_match_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    variables, model = _variables(jax.random.PRNGKey(1), x)

    want = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, x))
    got = np.asarray(densenet_features_pallas(
        SPEC, variables, x, dtype=jnp.float32, interpret=True))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_features_jit_and_batch():
    """Under jit, with a batch size that exercises the multi-tile grid path."""
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 32, 32, 3), jnp.float32)
    variables, model = _variables(jax.random.PRNGKey(3), x)

    want = np.asarray(model.apply(variables, x, train=False))
    fn = jax.jit(lambda v, x: densenet_features_pallas(
        SPEC, variables, x, dtype=jnp.float32, interpret=True))
    got = np.asarray(fn(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frame_model_fast_path():
    """FrameModel (backbone + Dense head) through the kernel fast path."""
    from tennis_tpu.models import FrameModel
    from tennis_tpu.models.backbones.densenet import DenseNet
    from tennis_tpu.ops.pallas.dense_block import frame_model_apply_pallas

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3), jnp.float32)
    model = FrameModel(DenseNet(SPEC, dtype=jnp.float32), num_classes=11,
                       dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(5), x)

    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(frame_model_apply_pallas(model, variables, x,
                                              interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unaligned_block_width_rejected():
    spec = DenseNetSpec((3,), growth_rate=32, num_init_features=64)
    model = DenseNet(spec, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    with pytest.raises(AssertionError):
        densenet_features_pallas(spec, variables, x, dtype=jnp.float32,
                                 interpret=True)
