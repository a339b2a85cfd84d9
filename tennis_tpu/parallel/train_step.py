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
from tennis_tpu.parallel.mesh import (
    batch_sharding, replicated, tpu_compiler_options,
)


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


def create_train_state(model, rng, sample_input, tx, train_kwargs=None,
                       mesh=None) -> TrainState:
    """Initialize model + optimizer state under ONE jit (eager per-op init over
    the tunneled TPU takes minutes; jitted it takes seconds). With ``mesh``, the
    state is created directly with its production shardings (params/opt state
    per sharding_rules.state_shardings) — no host round-trip or reshard copy."""

    def init_fn(rng, sample):
        variables = model.init(rng, sample, **(train_kwargs or {}))
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
            tx=tx,
        )

    if mesh is None:
        return jax.jit(init_fn)(rng, sample_input)
    from tennis_tpu.parallel.sharding_rules import state_shardings

    abstract = jax.eval_shape(init_fn, rng, sample_input)
    shardings = state_shardings(mesh, abstract)
    return jax.jit(init_fn, out_shardings=shardings)(rng, sample_input)


def softmax_ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def make_train_step(model, mesh=None, num_classes: int | None = None,
                    loss_fn: Callable = softmax_ce,
                    preprocess: Callable | None = None, rng_seed: int = 0,
                    state_sharding=None, compiler_options="auto"):
    """Build the jitted DP train step: (state, images, labels) → (state, loss[, cm]).

    With ``mesh``, inputs are expected batch-sharded and state replicated (or
    ``state_sharding``, e.g. sharding_rules.state_shardings for TP); the jit is
    annotated accordingly so XLA places the grad all-reduce on ICI.

    ``preprocess(images, key) -> images`` runs INSIDE the step (e.g. the fused
    uint8 augment stage); its PRNG key is ``fold_in(rng_seed, state.step)`` so no
    per-batch host-side RNG op is needed (each eager op over the tunneled TPU is a
    network round-trip) and resumed runs replay the same augmentation stream.
    """

    def step(state: TrainState, images, labels):
        if preprocess is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(rng_seed), state.step)
            images = preprocess(images, key)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return loss_fn(out, labels), (out, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        # stat-less models (e.g. feats-mode CNNRNN): flax returns the absent
        # collection as an empty plain dict, which would swap the state's
        # empty-FrozenDict node type and break the in_shardings prefix match
        # on the NEXT step — keep the input batch_stats object instead
        if not jax.tree_util.tree_leaves(new_bs):
            new_bs = None
        new_state = state.apply_gradients(grads, new_bs)
        if num_classes is not None:
            cm = confusion_matrix(labels, logits, num_classes)
            return new_state, loss, logits, cm
        return new_state, loss, logits

    # "auto" applies the tuned TPU options; pass None when the returned step is
    # invoked INSIDE another jit (options are top-level-only — e.g. bench.py's
    # fori-loop wrapper carries them itself)
    opts = tpu_compiler_options(mesh) if compiler_options == "auto" \
        else compiler_options
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,), compiler_options=opts)
    bs = batch_sharding(mesh)
    st = state_sharding if state_sharding is not None else replicated(mesh)
    # batch sharded on 'data'; output shardings inferred (the loss and confusion
    # matrix come back replicated — XLA inserts the all-reduces)
    return jax.jit(step, donate_argnums=(0,), in_shardings=(st, bs, bs),
                   compiler_options=opts)


def make_eval_step(model, mesh=None, num_classes: int | None = None,
                   preprocess: Callable | None = None, state_sharding=None,
                   compiler_options="auto"):
    """Jitted inference step: logits (+ optional per-batch confusion matrix).

    ``preprocess(images) -> images`` runs inside the jit (fused uint8→normalize).
    """

    def forward(params, batch_stats, images):
        if preprocess is not None:
            images = preprocess(images)
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, images, train=False)

    def forward_with_cm(params, batch_stats, images, labels):
        logits = forward(params, batch_stats, images)
        return logits, confusion_matrix(labels, logits, num_classes)

    step = forward if num_classes is None else forward_with_cm
    opts = tpu_compiler_options(mesh) if compiler_options == "auto" \
        else compiler_options
    if mesh is None:
        return jax.jit(step, compiler_options=opts)
    bs, rep = batch_sharding(mesh), replicated(mesh)
    if state_sharding is not None:
        p_sh, bs_sh = state_sharding.params, state_sharding.batch_stats
    else:
        p_sh, bs_sh = rep, rep
    shardings = (p_sh, bs_sh, bs) if num_classes is None else (p_sh, bs_sh, bs, bs)
    return jax.jit(step, in_shardings=shardings, compiler_options=opts)


def make_seq2seq_train_step(model, opt, loss_fn, mesh=None,
                            compiler_options="auto"):
    """Donating train step for the captioner (reference train_gnmt.py:319-337):
    ``(params, batch_stats, opt_state, src, tgt, src_vl, tgt_vl, seed)`` →
    ``(params, batch_stats, opt_state, loss)``.

    ``seed`` is a host-generated uint32 scalar; the dropout key is derived inside
    the jit, so the hot loop issues zero eager device ops. params/opt_state are
    donated — the Adam moments update in place instead of doubling live memory.
    With ``mesh``, batch tensors arrive sharded over the ``data`` axis.
    """

    def step(params, batch_stats, opt_state, src, tgt, src_vl, tgt_vl, seed):
        k_dropout, k_augment = jax.random.split(jax.random.PRNGKey(seed))

        def compute_loss(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, src, tgt[:, :-1],
                src_vl, tgt_vl - 1, train=True, rngs={"dropout": k_dropout,
                                                      "augment": k_augment},
                mutable=["batch_stats"],
            )
            return loss_fn(logits, tgt[:, 1:], tgt_vl - 1), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            params
        )
        updates, new_opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt_state, loss

    opts = tpu_compiler_options(mesh) if compiler_options == "auto" \
        else compiler_options
    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2), compiler_options=opts)
    bs, rep = batch_sharding(mesh), replicated(mesh)
    return jax.jit(step, donate_argnums=(0, 1, 2),
                   in_shardings=(rep, rep, rep, bs, bs, bs, bs, rep),
                   compiler_options=opts)
