import jax
import jax.numpy as jnp
import numpy as np

from tennis_tpu.models.backbones.densenet import DENSENET_SPECS, DenseNet


def test_concat_free_equals_naive():
    """Both dense-block formulations share one parameter tree and must agree in
    eval outputs, train outputs, and updated batch statistics."""
    spec = DENSENET_SPECS[121]
    a = DenseNet(spec, dtype=jnp.float32, concat_free=True)
    b = DenseNet(spec, dtype=jnp.float32, concat_free=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = jax.jit(a.init)(jax.random.PRNGKey(1), x)

    ya = jax.jit(a.apply)(variables, x)
    yb = jax.jit(b.apply)(variables, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)

    fa = jax.jit(lambda v, x: a.apply(v, x, train=True, mutable=["batch_stats"]))
    fb = jax.jit(lambda v, x: b.apply(v, x, train=True, mutable=["batch_stats"]))
    (ya, ma), (yb, mb) = fa(variables, x), fb(variables, x)
    # 5e-5: the folded (scale, shift) normalize fuses into different FMA
    # association orders in the two graph structures
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=5e-5)
    for pa, pb in zip(jax.tree_util.tree_leaves(ma["batch_stats"]),
                      jax.tree_util.tree_leaves(mb["batch_stats"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-4)
