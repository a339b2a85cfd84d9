import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.ops import GRUCell, unroll_rnn
from tennis_tpu.ops.pallas.gru import gru_params_from_cell, gru_sequence_pallas


@pytest.mark.parametrize("shape", [(5, 8, 16, 8), (3, 4, 12, 4)])
def test_pallas_gru_matches_scan(shape):
    """Interpret-mode kernel must equal the lax.scan GRU bit-for-bit-ish."""
    T, B, C, H = shape
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, C))
    h0 = jnp.zeros((B, H))

    cell = GRUCell(H)
    params = cell.init(rng, h0, x[:, 0])
    cell_fn = lambda c, xt: cell.apply(params, c, xt)
    h_scan, ys_scan = unroll_rnn(cell_fn, h0, x)

    wx, wh, bx, bh = gru_params_from_cell(params["params"])
    ys_pl, h_pl = gru_sequence_pallas(
        jnp.swapaxes(x, 0, 1), h0, wx, wh, bx, bh, interpret=True
    )
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_scan), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ys_pl, 0, 1)), np.asarray(ys_scan), atol=1e-5
    )


def test_pallas_gru_t1():
    """Degenerate single-step sequence (drain-path edge case)."""
    rng = jax.random.PRNGKey(1)
    B, C, H = 4, 8, 4
    x = jax.random.normal(rng, (1, B, C))
    h0 = jnp.zeros((B, H))
    cell = GRUCell(H)
    params = cell.init(rng, h0, x[0])
    wx, wh, bx, bh = gru_params_from_cell(params["params"])
    ys, h = gru_sequence_pallas(x, h0, wx, wh, bx, bh, interpret=True)
    h_ref, _ = cell.apply(params, h0, x[0])
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(h_ref), atol=1e-5)


def test_rnnlayer_pallas_path_matches_scan(monkeypatch):
    """RNNLayer with the pallas_gru context must reproduce the scan path exactly
    (masking included) while sharing one parameter tree.

    RNNLayer only takes the Pallas path on a TPU backend, so the backend check
    is faked and the kernel is forced through the interpreter; a spy asserts
    the Pallas recurrence actually ran (without it the test would silently
    compare the scan path to itself on CPU)."""
    import jax.numpy as jnp

    from tennis_tpu.ops.pallas import gru as pg
    from tennis_tpu.ops.rnn import RNNLayer, pallas_gru

    called = []
    orig_rec = pg.gru_recurrence_pallas

    def spy(*args, **kwargs):
        called.append(1)
        kwargs["interpret"] = True  # CPU: route the kernel through the interpreter
        return orig_rec(*args, **kwargs)

    monkeypatch.setattr(pg, "gru_recurrence_pallas", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    layer = RNNLayer("gru", 8, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 6, 5))
    vl = jnp.asarray([6, 4, 2])
    params = layer.init(rng, x, vl)
    f_scan, y_scan = layer.apply(params, x, vl)
    assert not called  # scan path outside the context
    with pallas_gru():
        f_pl, y_pl = layer.apply(params, x, vl)
    assert called, "pallas recurrence did not run"
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_scan),
                               atol=1e-5)
