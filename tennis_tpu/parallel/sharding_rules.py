"""Parameter sharding rules for the (data, model) mesh.

DP replicates parameters; the ``model`` axis tensor-shards the widest matmuls —
Dense/RNN-gate kernels on their output dimension — so that TP is a sharding-spec
change (XLA GSPMD inserts the all-gathers/reduce-scatters), not a model rewrite.
This is the upgrade path promised in SURVEY.md §5.7/§5.8.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tennis_tpu.parallel.mesh import MODEL_AXIS


def param_shardings(mesh: Mesh, params, min_tp_dim: int = 256):
    """NamedSharding pytree for ``params``: 2-D kernels whose output dim is both
    ≥ ``min_tp_dim`` and divisible by the model-axis size are column-sharded over
    ``model``; everything else is replicated."""
    tp = mesh.shape[MODEL_AXIS]

    def rule(path, x):
        is_kernel = any(getattr(k, "key", None) == "kernel" for k in path)
        if (
            tp > 1
            and is_kernel
            and x.ndim == 2
            and x.shape[-1] >= min_tp_dim
            and x.shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(mesh: Mesh, state):
    """Shardings for a full TrainState: params TP-sharded per :func:`param_shardings`;
    optimizer state leaves inherit the matching param sharding when the momentum
    trace mirrors the param pytree (optax sgd), else replicate."""
    rep = NamedSharding(mesh, P())
    p_sh = param_shardings(mesh, state.params)
    p_sh_leaves = jax.tree_util.tree_leaves(
        p_sh, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    param_shapes = [x.shape for x in jax.tree_util.tree_leaves(state.params)]

    shape_to_sh = {}
    for shape, sh in zip(param_shapes, p_sh_leaves):
        shape_to_sh.setdefault(shape, sh)

    def opt_rule(x):
        # momentum/trace entries have the same shape as their param; scalars and
        # schedule counters replicate
        return shape_to_sh.get(getattr(x, "shape", None), rep)

    return state.replace(
        step=rep,
        params=p_sh,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree_util.tree_map(opt_rule, state.opt_state),
    )
