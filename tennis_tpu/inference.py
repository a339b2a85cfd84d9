"""Shared checkpoint→jitted-eval-step loading for the inference drivers.

``predict.py`` (offline raw-video scoring) and ``serve.py`` (online HTTP
serving) consume the same artifact — a trained vision experiment — through the
same device program: best-epoch params into a jitted uint8→normalize→forward→
softmax step. One loader keeps the two from diverging (checkpoint selection,
dtype policy, compiler options).
"""
from __future__ import annotations

from functools import partial

import numpy as np
from absl import logging


def load_classifier(backbone: str, model_id: str, data_shape: int,
                    root: str = "data"):
    """Load a vision experiment's best epoch into a batched softmax scorer.

    Returns ``(classes, predict_probs, info)`` where ``predict_probs`` maps a
    uint8 image batch (B, S, S, 3) to host-side (B, num_classes) softmax and
    ``info`` records the experiment dir / epoch / validation score used.
    Checkpoint selection is ``best_or_latest`` (scores.txt argmax, falling
    back to the newest ``{epoch:04d}.params``).
    """
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.tennis_set import load_classes
    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.parallel.mesh import driver_compiler_options
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    classes = load_classes(root)
    model = FrameModel(get_backbone(backbone, dtype=jnp.bfloat16),
                       num_classes=len(classes), dtype=jnp.bfloat16)
    tx, _ = sgd_with_schedule(0.001)
    # the full TrainState (optimizer state included) is required as the
    # load_state template: checkpoints serialize the whole state tree
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, data_shape, data_shape, 3), jnp.float32),
        tx, {"train": True},
    )
    exp_dir = experiment_dir("vision", model_id)
    epoch, score = ckpt.best_or_latest(exp_dir)
    state = ckpt.load_state(ckpt.epoch_path(exp_dir, epoch), state)
    logging.info("loaded epoch %d (score=%s) from %s", epoch, score, exp_dir)

    @partial(jax.jit, compiler_options=driver_compiler_options(backbone))
    def eval_step(params, batch_stats, images):
        x = device_prepare(images)  # fused uint8→normalize→bf16 input stage
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def predict_probs(images) -> np.ndarray:
        return np.asarray(jax.device_get(
            eval_step(state.params, state.batch_stats, images)))

    info = {"exp_dir": exp_dir, "epoch": epoch, "score": score}
    return classes, predict_probs, info
