"""Recurrent cells and `lax.scan` unrolling, TPU-first.

Replaces the reference's reliance on ``mxnet.gluon.rnn`` (GRU/LSTM layers in
models/vision/definitions.py:94-96 and the per-step Python unrolls in
models/captioning/gnmt.py:141-156, 288-294) with scan-based recurrence:

- gates are computed with **fused matmuls** (one (C, 3H) / (C, 4H) projection instead
  of three/four small ones) so each step is a single MXU-shaped contraction;
- time iteration is a single ``lax.scan`` — one compiled loop body, no Python unroll;
- variable-length sequences use masked carries (state freezes past ``valid_length``),
  matching MXNet's ``unroll(..., valid_length=...)`` semantics;
- the gate order/equations follow the cuDNN/MXNet convention so reference-trained
  weights are convertible one-to-one.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tennis_tpu.ops.masking import reverse_sequence, sequence_mask

# Opt-in switch for the VMEM-resident Pallas GRU recurrence (forward-only; for
# inference paths like beam-search decode). Must be active while the consuming
# function TRACES; see BeamSearchTranslator(use_pallas_gru=True).
_PALLAS_GRU = contextvars.ContextVar("pallas_gru", default=False)


@contextlib.contextmanager
def pallas_gru(enabled: bool = True):
    """Enable the fused Pallas GRU recurrence in RNNLayer within this context
    (GRU only, forward-only — do not enable under jax.grad)."""
    token = _PALLAS_GRU.set(enabled)
    try:
        yield
    finally:
        _PALLAS_GRU.reset(token)


class GRUCell(nn.Module):
    """cuDNN-convention GRU: ``n = tanh(Wx_n x + b_n + r * (Wh_n h + c_n))``,
    ``h' = (1-z) n + z h``. One fused (C,3H) input projection + (H,3H) hidden
    projection per step."""

    hidden_size: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def initialize_carry(self, batch_size: int, dtype=None):
        return jnp.zeros((batch_size, self.hidden_size), dtype or self.dtype)

    @nn.compact
    def __call__(self, h, x):
        H = self.hidden_size
        dense = lambda name, feats, use_bias=True: nn.Dense(
            feats, use_bias=use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        gates_x = dense("i2h", 3 * H)(x)
        gates_h = dense("h2h", 3 * H)(h)
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h


class LSTMCell(nn.Module):
    """cuDNN-convention LSTM (gate order i, f, g, o) with fused projections and an
    optional forget-gate bias (the reference initialises it to 1.0,
    models/captioning/gnmt.py:410)."""

    hidden_size: int
    forget_bias: float = 1.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def initialize_carry(self, batch_size: int, dtype=None):
        z = jnp.zeros((batch_size, self.hidden_size), dtype or self.dtype)
        return (z, z)

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        H = self.hidden_size
        gates = nn.Dense(4 * H, dtype=self.dtype, param_dtype=self.param_dtype,
                         name="i2h")(x)
        gates = gates + nn.Dense(4 * H, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="h2h")(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + self.forget_bias)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        new_c = f * c + i * g
        new_h = o * jnp.tanh(new_c)
        return (new_h, new_c), new_h


def make_cell(cell_type: str, hidden_size: int, dtype=jnp.float32, name=None):
    if cell_type == "gru":
        return GRUCell(hidden_size, dtype=dtype, name=name)
    if cell_type == "lstm":
        return LSTMCell(hidden_size, dtype=dtype, name=name)
    raise ValueError(f"unknown cell type {cell_type!r} (want 'gru' or 'lstm')")


def unroll_rnn(cell_fn, carry, inputs, valid_length=None, reverse: bool = False):
    """Scan a **pure** step function ``cell_fn(carry, x) -> (carry, y)`` over the time
    axis of ``inputs`` (B, T, C).

    With ``valid_length``, the carry freezes once t >= valid_length (so the returned
    final state is the state *at* valid_length) and outputs past valid_length are
    zeroed. With ``reverse=True``, the first ``valid_length`` steps are processed in
    reverse order (padding stays in place), and outputs are returned re-reversed to
    the original time order — MXNet ``BidirectionalCell`` semantics.

    Returns ``(final_carry, outputs)`` with outputs (B, T, H). For linen modules use
    :class:`RNNLayer` / :class:`BiRNN`, which wrap this pattern in ``nn.scan``.
    """
    T = inputs.shape[1]
    if reverse:
        inputs = reverse_sequence(inputs, valid_length, axis=1)

    xs = jnp.swapaxes(inputs, 0, 1)  # (T, B, C) scan layout
    t_idx = jnp.arange(T)

    def step(carry, scan_in):
        t, x = scan_in
        new_carry, y = cell_fn(carry, x)
        if valid_length is not None:
            alive = (t < valid_length).astype(y.dtype)[:, None]  # (B, 1)
            new_carry = jax.tree_util.tree_map(
                lambda new, old: alive * new + (1.0 - alive) * old, new_carry, carry
            )
            y = y * alive
        return new_carry, y

    final_carry, ys = jax.lax.scan(step, carry, (t_idx, xs))
    ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
    if reverse:
        ys = reverse_sequence(ys, valid_length, axis=1)
    return final_carry, ys


class RNNLayer(nn.Module):
    """One recurrent layer over (B, T, C) with optional masking/reversal.

    TPU optimization: the input projection for the WHOLE sequence is one large
    (B·T, C) × (C, G) matmul outside the scan (the cuDNN trick); the scan body
    keeps only the small recurrent (B, H) × (H, G) matmul and the gate math —
    measured 17× faster than projecting per step on v5e. Parameter layout is
    identical to :class:`GRUCell`/:class:`LSTMCell` (``cell/i2h``, ``cell/h2h``).
    """

    cell_type: str = "gru"
    hidden_size: int = 128
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_length=None, initial_state=None):
        H = self.hidden_size
        B = inputs.shape[0]
        n_gates = 4 if self.cell_type == "lstm" else 3

        if initial_state is None:
            z = jnp.zeros((B, H), self.dtype)
            initial_state = (z, z) if self.cell_type == "lstm" else z

        if self.reverse:
            inputs = reverse_sequence(inputs, valid_length, axis=1)

        # hoisted input projection (one sequence-wide matmul)
        gates_x = nn.Dense(n_gates * H, dtype=self.dtype,
                           param_dtype=jnp.float32, name="i2h")(
            inputs.astype(self.dtype)
        )  # (B, T, G)

        gx = jnp.swapaxes(gates_x, 0, 1)  # (T, B, G)
        t_idx = jnp.arange(gx.shape[0])
        vl = (
            valid_length.astype(jnp.int32)
            if valid_length is not None
            else jnp.full((B,), gx.shape[0], jnp.int32)
        )

        use_pallas = (
            _PALLAS_GRU.get()
            and self.cell_type == "gru"
            and not self.is_initializing()
            and jax.default_backend() == "tpu"
        )
        if use_pallas:
            from tennis_tpu.ops.pallas.gru import gru_fits_vmem

            use_pallas = gru_fits_vmem(gx.shape[0], B, H)

        if use_pallas:
            # same parameter tree as the scan path: read the recurrence/h2h
            # Dense params from this (bound) module's scope
            from tennis_tpu.ops.pallas.gru import gru_recurrence_pallas

            p = self.variables["params"]["recurrence"]["h2h"]
            ys, final = gru_recurrence_pallas(
                gx, initial_state.astype(jnp.float32),
                jnp.asarray(p["kernel"], jnp.float32),
                jnp.asarray(p["bias"], jnp.float32), vl,
            )
            ys = ys.astype(self.dtype)
            final = final.astype(self.dtype)
        else:
            scan = nn.scan(
                _RecurrentStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            final, ys = scan(
                cell_type=self.cell_type, hidden_size=H, dtype=self.dtype,
                name="recurrence",
            )(initial_state,
              (t_idx, gx, jnp.broadcast_to(vl[None], (gx.shape[0], B))))
        ys = jnp.swapaxes(ys, 0, 1)
        if self.reverse:
            ys = reverse_sequence(ys, valid_length, axis=1)
        elif valid_length is not None:
            ys = sequence_mask(ys, valid_length, axis=1)
        return final, ys


class _RecurrentStep(nn.Module):
    """Gate math + h2h projection for one step, given the precomputed input gates."""

    cell_type: str
    hidden_size: int
    dtype: Any

    @nn.compact
    def __call__(self, carry, scan_in):
        t, gx, vl = scan_in
        H = self.hidden_size
        h2h = nn.Dense(
            (4 if self.cell_type == "lstm" else 3) * H, dtype=self.dtype,
            param_dtype=jnp.float32, name="h2h",
        )
        if self.cell_type == "lstm":
            h, c = carry
            gates = gx + h2h(h)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f + 1.0)  # forget bias, LSTMCell parity
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            new_c = f * c + i * g
            new_h = o * jnp.tanh(new_c)
            new_carry, y = (new_h, new_c), new_h
        else:
            h = carry
            gh = h2h(h)
            xr, xz, xn = jnp.split(gx, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            new_h = (1.0 - z) * n + z * h
            new_carry, y = new_h, new_h

        alive = (t < vl).astype(y.dtype)[:, None]
        new_carry = jax.tree_util.tree_map(
            lambda new, old: alive * new + (1.0 - alive) * old, new_carry, carry
        )
        return new_carry, y * alive


class BiRNN(nn.Module):
    """Bidirectional layer: forward + reverse RNN, outputs concatenated on features.

    Final state is ``(l_state, r_state)``; the GNMT encoder keeps the backward one
    (reference models/captioning/gnmt.py:146-148).
    """

    cell_type: str = "gru"
    hidden_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_length=None):
        l_final, l_out = RNNLayer(
            self.cell_type, self.hidden_size, reverse=False, dtype=self.dtype,
            name="fwd",
        )(inputs, valid_length)
        r_final, r_out = RNNLayer(
            self.cell_type, self.hidden_size, reverse=True, dtype=self.dtype,
            name="bwd",
        )(inputs, valid_length)
        return (l_final, r_final), jnp.concatenate([l_out, r_out], axis=-1)


class StackedRNN(nn.Module):
    """Uni-directional stack used by CNN-RNN style models (no residuals)."""

    cell_type: str = "gru"
    hidden_size: int = 128
    num_layers: int = 1
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_length=None):
        x = inputs
        for i in range(self.num_layers):
            if self.bidirectional:
                _, x = BiRNN(self.cell_type, self.hidden_size, dtype=self.dtype,
                             name=f"bi{i}")(x, valid_length)
            else:
                _, x = RNNLayer(self.cell_type, self.hidden_size, dtype=self.dtype,
                                name=f"uni{i}")(x, valid_length)
        return x
