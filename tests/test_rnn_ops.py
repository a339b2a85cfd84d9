import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.ops import (
    BiRNN,
    GRUCell,
    LSTMCell,
    StackedRNN,
    reverse_sequence,
    sequence_mask,
    unroll_rnn,
)
from tennis_tpu.ops.rnn import RNNLayer


def test_sequence_mask():
    x = jnp.ones((2, 4, 3))
    out = sequence_mask(x, jnp.array([2, 4]))
    assert (np.asarray(out[0, :2]) == 1).all() and (np.asarray(out[0, 2:]) == 0).all()
    assert (np.asarray(out[1]) == 1).all()


def test_reverse_sequence_keeps_padding():
    x = jnp.arange(8).reshape(1, 8, 1).astype(jnp.float32)
    out = reverse_sequence(x, jnp.array([5]))
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 0]), [4, 3, 2, 1, 0, 5, 6, 7]
    )
    # double reversal is identity
    out2 = reverse_sequence(out, jnp.array([5]))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))


def _numpy_gru_step(params, h, x):
    """Plain-numpy GRU with cuDNN gate order, for cross-checking the scan cell."""
    p = params["params"]
    gx = x @ np.asarray(p["i2h"]["kernel"]) + np.asarray(p["i2h"]["bias"])
    gh = h @ np.asarray(p["h2h"]["kernel"]) + np.asarray(p["h2h"]["bias"])
    H = h.shape[-1]
    sig = lambda v: 1 / (1 + np.exp(-v))
    r = sig(gx[:, :H] + gh[:, :H])
    z = sig(gx[:, H : 2 * H] + gh[:, H : 2 * H])
    n = np.tanh(gx[:, 2 * H :] + r * gh[:, 2 * H :])
    return (1 - z) * n + z * h


def test_gru_cell_matches_numpy_reference():
    cell = GRUCell(6)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (3, 4))
    h = jnp.zeros((3, 6))
    params = cell.init(rng, h, x)
    (h1, _) = cell.apply(params, h, x)
    h1_np = _numpy_gru_step(params, np.zeros((3, 6)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(h1), h1_np, atol=1e-4)


def test_lstm_forget_bias():
    cell = LSTMCell(4, forget_bias=1.0)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 4))
    carry = cell.initialize_carry(1)
    params = cell.init(rng, carry, x)
    # zero params + zero input → f = sigmoid(1.0); c' = f*c
    p = jax.tree_util.tree_map(jnp.zeros_like, params)
    c0 = (jnp.zeros((1, 4)), jnp.ones((1, 4)))
    (h1, c1), _ = cell.apply(p, c0, x)
    np.testing.assert_allclose(np.asarray(c1), 1 / (1 + np.exp(-1.0)), rtol=1e-6)


def test_unroll_matches_python_loop():
    cell = GRUCell(5)
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 7, 3))
    h0 = jnp.zeros((2, 5))
    params = cell.init(rng, h0, x[:, 0])

    cell_fn = lambda c, xt: cell.apply(params, c, xt)
    final, ys = unroll_rnn(cell_fn, h0, x)

    h = h0
    outs = []
    for t in range(7):
        h, y = cell_fn(h, x[:, t])
        outs.append(y)
    np.testing.assert_allclose(np.asarray(final), np.asarray(h), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ys), np.asarray(jnp.stack(outs, axis=1)), rtol=1e-5
    )


def test_unroll_valid_length_state_freeze():
    cell = GRUCell(5)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 6, 3))
    h0 = jnp.zeros((2, 5))
    params = cell.init(rng, h0, x[:, 0])
    cell_fn = lambda c, xt: cell.apply(params, c, xt)

    vl = jnp.array([3, 6])
    final, ys = unroll_rnn(cell_fn, h0, x, valid_length=vl)
    final_trunc, _ = unroll_rnn(cell_fn, h0, x[:1, :3])
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(final_trunc[0]),
                               rtol=1e-5)
    assert (np.asarray(ys[0, 3:]) == 0).all()


def test_reverse_unroll_equals_flipped_forward():
    """With full valid_length, reverse unroll == forward unroll on flipped input."""
    cell = GRUCell(4)
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (2, 5, 3))
    h0 = jnp.zeros((2, 4))
    params = cell.init(rng, h0, x[:, 0])
    cell_fn = lambda c, xt: cell.apply(params, c, xt)

    f_rev, ys_rev = unroll_rnn(cell_fn, h0, x, reverse=True)
    f_fwd, ys_fwd = unroll_rnn(cell_fn, h0, jnp.flip(x, axis=1))
    np.testing.assert_allclose(np.asarray(f_rev), np.asarray(f_fwd), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ys_rev), np.asarray(jnp.flip(ys_fwd, axis=1)), rtol=1e-5
    )


@pytest.mark.parametrize("cell_type", ["gru", "lstm"])
def test_birnn_shapes_and_jit(cell_type):
    bi = BiRNN(cell_type, 8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 4))
    vl = jnp.array([3, 5])
    params = bi.init(rng, x, vl)
    apply = jax.jit(lambda p, x, vl: bi.apply(p, x, vl))
    (lf, rf), ys = apply(params, x, vl)
    assert ys.shape == (2, 5, 16)
    # backward stream output at t=0 summarises x[0:vl]; masked region is zero
    assert (np.asarray(ys[0, 3:]) == 0).all()


def test_rnnlayer_initial_state():
    layer = RNNLayer("gru", 4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 4))
    params = layer.init(rng, x)
    h0 = jnp.ones((2, 4))
    final_a, _ = layer.apply(params, x, None, h0)
    final_b, _ = layer.apply(params, x)
    assert not np.allclose(np.asarray(final_a), np.asarray(final_b))


def test_stacked_rnn_gradients_flow():
    st = StackedRNN("gru", 8, num_layers=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 4))
    params = st.init(rng, x)

    def loss(p):
        return jnp.sum(st.apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
