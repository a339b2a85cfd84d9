"""Jitted, sharded train/eval steps with donated state.

Replaces the reference's per-batch hot loop (forward per device in Python,
``ag.backward`` + ``Trainer.step`` all-reduce, ``.asscalar()`` syncs; reference
train.py:404-431) with a single ``jax.jit`` step over a mesh:

- the batch arrives sharded on the ``data`` axis; XLA inserts the gradient
  all-reduce (this *is* the DP strategy — no explicit collectives in user code);
- optimizer state is donated, so parameter memory is updated in place;
- metrics (loss, confusion-matrix counts) come back as replicated scalars/matrices,
  one device sync per logging interval instead of one per batch.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from tennis_tpu.metrics.vision import confusion_matrix
from tennis_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def sgd_with_schedule(
    lr: float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    lr_steps=(),
    lr_factor: float = 0.75,
    steps_per_epoch: int = 1,
):
    """SGD + momentum + L2 weight decay with the reference's epoch-boundary step
    schedule (reference train.py:298-299,395-397): lr *= factor at each epoch in
    ``lr_steps``."""
    boundaries = {int(e) * steps_per_epoch: lr_factor for e in lr_steps}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )
    return tx, schedule


def adam_with_clip(lr: float, clip: float = 5.0):
    """Adam + global-norm clipping (the captioner's optimizer; reference
    train_gnmt.py:95-104,253-258)."""
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


def create_train_state(model, rng, sample_input, tx, train_kwargs=None) -> TrainState:
    variables = model.init(rng, sample_input, **(train_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def softmax_ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def make_train_step(model, mesh=None, num_classes: int | None = None,
                    loss_fn: Callable = softmax_ce):
    """Build the jitted DP train step: (state, images, labels) → (state, loss[, cm]).

    With ``mesh``, inputs are expected batch-sharded and state replicated; the jit is
    annotated accordingly so XLA places the grad all-reduce on ICI.
    """

    def step(state: TrainState, images, labels):
        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return loss_fn(out, labels), (out, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        if num_classes is not None:
            cm = confusion_matrix(labels, logits, num_classes)
            return new_state, loss, logits, cm
        return new_state, loss, logits

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    bs, rep = batch_sharding(mesh), replicated(mesh)
    # state replicated, batch sharded on 'data'; output shardings inferred (the loss
    # and confusion matrix come back replicated — XLA inserts the all-reduces)
    return jax.jit(step, donate_argnums=(0,), in_shardings=(rep, bs, bs))


def make_eval_step(model, mesh=None, num_classes: int | None = None):
    """Jitted inference step: logits (+ optional per-batch confusion matrix)."""

    def step(params, batch_stats, images, labels=None):
        variables = {"params": params, "batch_stats": batch_stats}
        logits = model.apply(variables, images, train=False)
        if num_classes is not None and labels is not None:
            return logits, confusion_matrix(labels, logits, num_classes)
        return logits

    return jax.jit(step)
