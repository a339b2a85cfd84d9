"""Parallelism: device mesh, sharding rules, jitted train/eval step harness."""

from tennis_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, pad_batch,
)
from tennis_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_seq2seq_train_step,
    sgd_with_schedule,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "pad_batch",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_seq2seq_train_step",
    "sgd_with_schedule",
]
