"""Event-classifier evaluation driver (CLI-compatible with the reference
evaluate.py:78-321).

Rebuilds the model from the same flag surface as tennis_tpu.train (the flag module is
shared), loads the best epoch via ``scores.txt``, computes the metric suite and the
per-frame results dict, and optionally renders the overlay video (``--vis``,
reference evaluate.py:269-270) or dumps backbone features (``--save_feats``).

Run: ``python -m tennis_tpu.evaluate --model_id 0006 --backbone DenseNet121 ...``
"""
from __future__ import annotations

import os
import time

import numpy as np
from absl import app, flags, logging

# shares the full training flag surface (reference evaluate.py redefines the same
# flags; importing registers them once)
from tennis_tpu import train as train_driver
from tennis_tpu.data.tennis_set import get_image_path

FLAGS = flags.FLAGS

flags.DEFINE_string("split", "test",
                    "the split to evaluate on: train, val, or test "
                    "(reference evaluate.py:40-41)")
flags.DEFINE_string("metrics_out", "",
                    "optional path: dump the PRF1 metric dict as JSON "
                    "(machine-readable surface for tennis_tpu.parity)")


def evaluate_model():
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.loader import DataLoader
    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import backbone_feature_dim
    from tennis_tpu.parallel import batch_sharding, create_train_state, make_mesh
    from tennis_tpu.parallel.distributed import (
        host_batch_slice, initialize_multihost, make_pod_mesh,
    )
    from tennis_tpu.parallel.train_step import sgd_with_schedule
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir, setup_logging

    # pod-mode eval (symmetry with train.py --multihost): sharded loaders,
    # lockstep collective fetches, exact wrap-duplicate masking
    if FLAGS.multihost:
        initialize_multihost(FLAGS.coordinator, FLAGS.num_hosts, FLAGS.host_id)

    exp_dir = experiment_dir("vision", FLAGS.model_id)
    setup_logging(exp_dir, {k: FLAGS[k].value for k in FLAGS})

    # --split picks the evaluated split with test-time settings; the variable
    # keeps the reference's "test_set" name (reference evaluate.py:107)
    test_set = train_driver.make_eval_dataset(FLAGS.split)
    logging.info(test_set)

    feats = bool(FLAGS.feats_model)
    # --temp_pool max/mean evaluates a *framewise-trained* donor with its
    # backbone features pooled over the window and its OWN trained head applied
    # after the pool (reference evaluate.py:242-244 wraps
    # TemporalPooling(num_classes=0): TimeDistributed backbone + model.classes,
    # definitions.py:52-55); the checkpoint tree is the plain FrameModel's, so
    # build that and pool between features and head in the eval step.
    pool_eval = FLAGS.temp_pool in ("max", "mean")
    if pool_eval:
        from tennis_tpu.models import FrameModel, get_backbone
        import jax.numpy as _jnp

        if FLAGS.window <= 1:
            raise ValueError("--temp_pool max|mean needs --window > 1")
        if FLAGS.save_feats:
            raise ValueError(
                "--save_feats cannot combine with --temp_pool max|mean: the "
                "pooled wrap has no per-frame feature dump (dump from the "
                "donor experiment instead)"
            )
        model = FrameModel(get_backbone(FLAGS.backbone, dtype=_jnp.bfloat16),
                           test_set.num_class)
    else:
        model = train_driver.build_model(test_set.num_class, feats)
    feat_dim = backbone_feature_dim(FLAGS.backbone, FLAGS.data_shape)

    host_batch = FLAGS.batch_size
    if jax.process_count() > 1:
        host_batch = host_batch_slice(FLAGS.batch_size)
    loader = DataLoader(
        test_set, batch_size=host_batch, shuffle=False,
        num_workers=FLAGS.num_workers if FLAGS.num_workers > 0 else 8,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
        transform=None if feats else train_driver._geometry_transform(False),
    )

    mesh = make_pod_mesh() if FLAGS.multihost else make_mesh()
    tx, _ = sgd_with_schedule(FLAGS.lr)
    rng = jax.random.PRNGKey(FLAGS.seed)
    c = 6 if FLAGS.flow else 3
    sample_shape = (
        (1, FLAGS.data_shape, FLAGS.data_shape, c) if pool_eval
        else train_driver._sample_shape(test_set.num_class, feats, feat_dim)
    )
    # created with its mesh shardings so the checkpoint load below re-places
    # the restored host arrays on the mesh ONCE (load_state's contract) — a
    # single-device or host-numpy param tree would re-upload per eval batch
    state = create_train_state(model, rng, jnp.zeros(sample_shape, jnp.float32),
                               tx, {"train": True}, mesh=mesh)

    # temp-pool mode loads the DONOR experiment's checkpoint (reference
    # evaluate.py:224-240: mod_path is --feats_model for max/mean)
    src_dir = exp_dir
    if pool_eval and FLAGS.feats_model:
        src_dir = experiment_dir("vision", FLAGS.feats_model)
    elif pool_eval and FLAGS.backbone_from_id:
        src_dir = experiment_dir("vision", FLAGS.backbone_from_id)
    best = ckpt.best_or_latest(src_dir)
    state = ckpt.load_state(ckpt.epoch_path(src_dir, best[0]), state)
    logging.info("loaded epoch %d (score=%s) from %s", best[0], best[1], src_dir)

    if FLAGS.save_feats:  # feature dump from the best epoch (reference
        # evaluate.py:186-204,306-321)
        # the reference dumps ONLY the --split dataset here (evaluate.py:209-211
        # zips the single test_data/test_set pair); run once per split to cover
        # all three — train.py --save_feats remains the all-splits dump
        loaders = {FLAGS.split: loader}
        train_driver.save_features(model, state, [test_set], loaders, mesh)
        return {}, {}, {}

    from functools import partial

    from tennis_tpu.parallel.mesh import driver_compiler_options

    _opts = driver_compiler_options(FLAGS.backbone, mesh)

    @partial(jax.jit, compiler_options=_opts)
    def eval_step(params, batch_stats, images):
        if images.dtype == jnp.uint8:
            flat = images.reshape((-1,) + images.shape[-3:])
            images = device_prepare(flat).reshape(images.shape)
        variables = {"params": params, "batch_stats": batch_stats}
        if pool_eval:
            # the reference's TemporalPooling(num_classes=0) wrap: pool the
            # donor's BACKBONE features over time, then its trained head —
            # through the module, with the donor's bare FrameModel tree
            # re-rooted under its 'model' submodule
            from tennis_tpu.models import TemporalPooling

            tp = TemporalPooling(model=model, pool=FLAGS.temp_pool,
                                 feats=feats, wrap_head=True)
            logits = tp.apply(
                {"params": {"model": params},
                 "batch_stats": {"model": batch_stats}},
                images, train=False,
            )
        else:
            logits = model.apply(variables, images, train=False)
        return jax.nn.softmax(logits, axis=-1)

    from tennis_tpu.data.loader import sharded_eval_iter

    metrics = train_driver._metric_set(test_set.classes)
    results, gts = {}, {}
    tic = time.time()

    # the shared sharded eval loop: device transfers overlap compute, one host
    # fetch per batch, wrap-padded duplicate rows dropped exactly
    for probs_np, labels, idxs in sharded_eval_iter(
            loader, host_batch, len(test_set), batch_sharding(mesh),
            lambda images: eval_step(state.params, state.batch_stats, images)):
        for m in metrics.values():
            m.update(labels, probs_np)
        for p, label, idx in zip(probs_np, labels, idxs):
            sample = test_set._samples[int(idx)]
            img_path = get_image_path("frames", sample[0], sample[1])
            results[img_path] = p
            gts[img_path] = int(label)
    logging.info("evaluated %d frames in %.1fs", len(results), time.time() - tic)

    for name, value in metrics["prf1"].get():
        logging.info("test %s=%.4f", name, value)
    logging.info("confusion:\n%s", metrics["prf1"].confusion_str())

    if FLAGS.metrics_out and jax.process_index() == 0:
        import json

        with open(FLAGS.metrics_out, "w") as f:
            json.dump(metrics["prf1"].get_dict(), f)

    if FLAGS.vis and jax.process_index() == 0:
        # every host holds the full gathered results; one writer is enough
        from tennis_tpu.utils.visualisation import visualise_events

        out_path = os.path.join(exp_dir, "results.mp4")
        visualise_events(test_set, results, out_path)
        logging.info("wrote %s", out_path)

    return results, gts, metrics


def main(_argv):
    evaluate_model()


if __name__ == "__main__":
    app.run(main)
