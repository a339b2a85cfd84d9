"""Fused GRU-recurrence Pallas kernel.

The hot op of the temporal models (CNN-RNN over feature windows, reference
models/vision/definitions.py:96-107): a GRU over time. The input projection for
the whole sequence is one large MXU matmul done OUTSIDE the kernel (the cuDNN
trick; see tennis_tpu.ops.rnn.RNNLayer). What remains — the strictly sequential
(B, H) × (H, 3H) recurrence — is where ``lax.scan`` pays per-step staging
overhead (~90 µs/step measured on v5e). This kernel runs the ENTIRE recurrence
in one ``pallas_call``:

- the precomputed gates (T, B, 3H), the recurrent weights, the carried state and
  all outputs live in VMEM for the whole sequence — zero HBM traffic inside the
  loop (a 30×64×384 f32 gate block is ~3 MB, well under the ~16 MB VMEM budget);
- each step is one small MXU matmul + fused VPU gate math.

Forward-only (inference/decode); training uses the autodiff scan.

Measured on v5e, exact numerical match with the scan implementation:
- CNN-RNN shapes (T=30, B=64, C=4096, H=128): 23× faster than the
  per-step-projection scan; on par with the hoisted-projection XLA scan
  (1.8 ms vs 1.7 ms) — training keeps the autodiff scan;
- beam-4 decode (features path, B=32, T=120, C=4096, full 30-step decode,
  loop-carried timing): 4.21 → 1.60 ms/batch end to end, 2.6× — ADOPTED as the
  default encoder path in BeamSearchTranslator (tennis_tpu/translation.py), via
  the ``pallas_gru`` context in ops/rnn.py (falls back to the scan off-TPU or
  beyond the VMEM budget).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard: gates + outputs + weights must fit comfortably
_VMEM_LIMIT_BYTES = 12 * 1024 * 1024


def _recurrence_kernel(gx_ref, h0_ref, wh_ref, bh_ref, vl_ref, ys_ref,
                       h_final_ref):
    T = gx_ref.shape[0]
    H = h0_ref.shape[-1]
    wh = wh_ref[:]
    bh = bh_ref[:]
    vl = vl_ref[:]

    def step(t, h):
        gx = gx_ref[t]
        gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gx[:, 2 * H :] + r * gh[:, 2 * H :])
        new_h = (1.0 - z) * n + z * h
        # valid-length semantics of ops.rnn.RNNLayer: carry freezes at t >= vl,
        # outputs past vl are zero
        alive = (t < vl).astype(jnp.float32)[:, None]
        new_h = alive * new_h + (1.0 - alive) * h
        ys_ref[t] = new_h * alive
        return new_h

    h = jax.lax.fori_loop(0, T, step, h0_ref[:].astype(jnp.float32))
    h_final_ref[:] = h


def gru_fits_vmem(T: int, B: int, H: int) -> bool:
    """Whether the whole recurrence (gates, outputs, weights) fits the kernel's
    VMEM budget."""
    G = 3 * H
    vmem = 4 * (T * B * G + T * B * H + H * G + B * H)
    return vmem <= _VMEM_LIMIT_BYTES


def gru_recurrence_pallas(gates_x, h0, wh, bh, valid_length=None,
                          interpret: bool = False):
    """GRU recurrence over precomputed input gates.

    Args:
        gates_x: (T, B, 3H) = x @ Wx + bx for every step (one big matmul upstream).
        h0: (B, H); wh: (H, 3H); bh: (3H,). Gate order r, z, n (cuDNN).
        valid_length: optional (B,) int; past it the carry freezes and outputs
            are zeroed (ops.rnn.RNNLayer masking semantics).

    Returns:
        (ys (T, B, H), h_final (B, H)) float32.
    """
    T, B, G = gates_x.shape
    H = h0.shape[-1]
    if not gru_fits_vmem(T, B, H):
        raise ValueError(
            "sequence too large for the VMEM-resident kernel; "
            "fall back to tennis_tpu.ops.rnn"
        )
    if valid_length is None:
        valid_length = jnp.full((B,), T, jnp.int32)
    return pl.pallas_call(
        _recurrence_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(gates_x.astype(jnp.float32), h0, wh, bh,
      valid_length.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_sequence_pallas(x, h0, wx, wh, bx, bh, interpret: bool = False):
    """Full GRU over (T, B, C) inputs: one sequence-wide input projection on the
    MXU, then the VMEM-resident Pallas recurrence.

    Parameter layout matches tennis_tpu.ops.rnn.GRUCell (see
    :func:`gru_params_from_cell`). Returns (ys (T, B, H), h_final (B, H)).
    """
    gates_x = (
        jnp.einsum("tbc,cg->tbg", x, wx.astype(x.dtype),
                   preferred_element_type=jnp.float32)
        + bx
    )
    return gru_recurrence_pallas(gates_x, h0, wh, bh, interpret=interpret)


def gru_params_from_cell(cell_params):
    """Flatten a tennis_tpu.ops.rnn.GRUCell param subtree into the kernel's
    (wx, wh, bx, bh) operands."""
    p = cell_params
    return (p["i2h"]["kernel"], p["h2h"]["kernel"],
            p["i2h"]["bias"], p["h2h"]["bias"])
