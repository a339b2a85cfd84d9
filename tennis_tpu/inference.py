"""Shared checkpoint→jitted-eval-step loading for the inference drivers.

``predict.py`` (offline raw-video scoring) and ``serve.py`` (online HTTP
serving) consume the same artifact — a trained vision experiment — through the
same device program: best-epoch params into a jitted uint8→normalize→forward→
softmax step. One loader keeps the two from diverging (checkpoint selection,
dtype policy, compiler options).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
from absl import logging


def load_classifier_state(backbone: str, model_id: str, data_shape: int,
                          root: str = "data"):
    """Restore a vision experiment's best epoch into (classes, model, state,
    info) — the artifact-loading half shared by the live scorer below and the
    ahead-of-time exporter (``tennis_tpu/export.py``). Checkpoint selection is
    ``best_or_latest`` (scores.txt argmax, falling back to the newest
    ``{epoch:04d}.params``)."""
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.tennis_set import load_classes
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
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
    info = {"exp_dir": exp_dir, "epoch": epoch, "score": score}
    return classes, model, state, info


def load_classifier(backbone: str, model_id: str, data_shape: int,
                    root: str = "data"):
    """Load a vision experiment's best epoch into a batched softmax scorer.

    Returns ``(classes, predict_probs, info)`` where ``predict_probs`` maps a
    uint8 image batch (B, S, S, 3) to host-side (B, num_classes) softmax and
    ``info`` records the experiment dir / epoch / validation score used.
    """
    import jax

    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.parallel.mesh import driver_compiler_options

    classes, model, state, info = load_classifier_state(
        backbone, model_id, data_shape, root)

    @partial(jax.jit, compiler_options=driver_compiler_options(backbone))
    def eval_step(params, batch_stats, images):
        x = device_prepare(images)  # fused uint8→normalize→bf16 input stage
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def predict_probs(images) -> np.ndarray:
        return np.asarray(jax.device_get(
            eval_step(state.params, state.batch_stats, images)))

    return classes, predict_probs, info


def load_captioner_state(model_id: str, root: str = "data", gnmt_argv=(),
                         src_max_len: int = 128):
    """Restore a captioning experiment's ``valid_best.params`` into
    ``(vocab, model, variables, info)`` — the artifact-loading half shared by
    the live beam decoder below and the ahead-of-time exporter
    (``tennis_tpu/export.py::export_captioner``).

    Features-path only (the flagship 0102 configuration — reference
    train_gnmt.py:188-194 consumes dumped 0006 features; serving the pixels
    path would mean streaming whole frame sequences over HTTP). ``gnmt_argv``
    carries the architecture flags the checkpoint was trained with
    (``--num_hidden=256 --feats_model=0006 ...``), parsed by the train_gnmt
    flag surface so model construction has one source of truth. ``info``
    additionally records the decode hyper-parameters (beam size, length
    penalty, max length) the flag surface pins.
    """
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data import TennisSet
    from tennis_tpu.train_gnmt import FLAGS as GFLAGS, build_model
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    GFLAGS.unparse_flags()
    GFLAGS(["load_captioner", f"--root={root}", f"--model_id={model_id}",
            *gnmt_argv])
    if not GFLAGS.feats_model:
        raise ValueError("serving supports the features-path captioner only "
                         "(pass --gnmt_flag=--feats_model=<vision exp id>)")

    # the checkpoint's token ids are positions in the train-split vocab
    # (reference train_gnmt.py:198-203); one sample also pins the feature dim
    data_train = TennisSet(root=root, captions=True, split="train",
                           every=GFLAGS.every, max_cap_len=GFLAGS.tgt_max_len,
                           feats_model=GFLAGS.feats_model)
    vocab = data_train.vocab
    feat_dim = int(np.asarray(data_train[0][0]).shape[-1])

    model = build_model(len(vocab))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, src_max_len, feat_dim), jnp.float32),
        jnp.zeros((1, 2), jnp.int32),
    )
    exp_dir = experiment_dir("captioning", model_id)
    best_path = os.path.join(exp_dir, "valid_best.params")
    restored = ckpt.load_state(
        best_path,
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
    )
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    logging.info("loaded %s (vocab %d, feat_dim %d)", best_path, len(vocab),
                 feat_dim)

    info = {"exp_dir": exp_dir, "vocab_size": len(vocab),
            "feat_dim": feat_dim, "src_max_len": src_max_len,
            "beam_size": GFLAGS.beam_size, "lp_alpha": GFLAGS.lp_alpha,
            "lp_k": GFLAGS.lp_k, "max_length": GFLAGS.tgt_max_len + 20}
    return vocab, model, variables, info


def load_captioner(model_id: str, root: str = "data", gnmt_argv=(),
                   src_max_len: int = 128):
    """Load a captioning experiment into a live batched beam decoder (the
    serving analogue of evaluate_gnmt's decode path; see
    ``load_captioner_state`` for the artifact contract).

    Returns ``(vocab, caption_batch, info)``: ``caption_batch`` maps a float32
    feature batch (B, src_max_len, D) + int32 valid lengths (B,) to a list of
    B token lists. B and src_max_len are static — ONE compiled beam program.
    """
    from tennis_tpu.translation import BeamSearchTranslator

    vocab, model, variables, info = load_captioner_state(
        model_id, root=root, gnmt_argv=gnmt_argv, src_max_len=src_max_len)

    translator = BeamSearchTranslator(
        model, bos_id=vocab[vocab.bos_token], eos_id=vocab[vocab.eos_token],
        beam_size=info["beam_size"], alpha=info["lp_alpha"], K=info["lp_k"],
        max_length=info["max_length"],
    )

    def caption_batch(feats: np.ndarray, lengths: np.ndarray):
        return translator.translate_tokens(
            variables, np.asarray(feats, np.float32),
            np.asarray(lengths, np.int32), vocab)

    return vocab, caption_batch, info
