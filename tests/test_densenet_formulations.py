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


def test_remat_matches_baseline_gradients():
    """remat='block' changes only what is stored for backward — loss,
    gradients, and updated BN stats must match the non-remat graph."""
    from tennis_tpu.models.backbones.densenet import DenseNetSpec

    spec = DenseNetSpec((2, 3), growth_rate=8, num_init_features=16, bn_size=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    base = DenseNet(spec, dtype=jnp.float32)
    variables = jax.jit(base.init)(jax.random.PRNGKey(1), x)

    def grads_of(model):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), mut["batch_stats"]

        (loss, bs), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        return (np.asarray(loss), jax.tree_util.tree_leaves(grads),
                jax.tree_util.tree_leaves(bs))

    loss0, grads0, bs0 = grads_of(base)
    for mode in ("block", "hires"):
        loss, grads, bs = grads_of(DenseNet(spec, dtype=jnp.float32, remat=mode))
        np.testing.assert_allclose(loss, loss0, rtol=1e-6)
        for g, g0 in zip(grads, grads0):
            np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                                       rtol=1e-5, atol=1e-6)
        for b, b0 in zip(bs, bs0):
            np.testing.assert_allclose(np.asarray(b), np.asarray(b0),
                                       rtol=1e-6, atol=1e-7)
