"""Captioning evaluator (CLI-compatible with the reference evaluate_gnmt.py:91-253).

Loads ``valid_best.params``, beam-decodes the test split, reports the NLG suite.
Reuses cached predictions when ``best_test_out.txt`` exists (reference
evaluate_gnmt.py:137-147 behaviour) unless ``--force`` is passed.

Run: ``python -m tennis_tpu.evaluate_gnmt --model_id 0102 --feats_model 0006 ...``
"""
from __future__ import annotations

import os
import sys

import numpy as np
from absl import flags, logging

from tennis_tpu.train_gnmt import (
    FLAGS,
    _write_sentences,
    build_model,
    make_datasets,
)

flags.DEFINE_bool("force", False, "re-decode even if best_test_out.txt exists",
                  flag_values=FLAGS)
flags.DEFINE_string("metrics_out", "",
                    "optional path: dump the NLG metric suite as JSON "
                    "(machine-readable surface for tennis_tpu.parity). "
                    "Scale contract: the raw nlg_metric_suite values — "
                    "Bleu_1..4/METEOR/ROUGE_L in [0,1], CIDEr on the "
                    "pycocoevalcap scale (internal x10 applied); the parity "
                    "gates multiply by 100 to reach the published table",
                    flag_values=FLAGS)


def evaluate(argv=None):
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.bucketing import BucketedCaptionLoader
    from tennis_tpu.metrics.nlg import nlg_metric_suite
    from tennis_tpu.translation import BeamSearchTranslator
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir, setup_logging

    exp_dir = experiment_dir("captioning", FLAGS.model_id)
    setup_logging(exp_dir, {name: FLAGS[name].value for name in FLAGS})

    data_train, _, data_test = make_datasets()
    vocab = data_train.vocab
    test_tgt = data_test.get_captions(split=True)

    cached = os.path.join(exp_dir, "best_test_out.txt")
    if os.path.exists(cached) and not FLAGS.force:
        logging.info("reusing cached predictions %s", cached)
        with open(cached, "r", encoding="utf-8") as f:
            hyps = [line.split() for line in f]
    else:
        model = build_model(len(vocab))
        loader = BucketedCaptionLoader(
            data_test, FLAGS.test_batch_size, FLAGS.num_buckets,
            FLAGS.bucket_scheme, FLAGS.bucket_ratio, shuffle=False,
            num_workers=FLAGS.num_workers, pad_multiple=8,
            key_element=-1,  # reference val/test buckets on caption length
        )
        try:
            first = next(iter(loader))
        except StopIteration:
            raise SystemExit(
                "test loader produced zero batches — no test captions under "
                f"--root, or bucketing consumed them all"
            ) from None
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            rng, jnp.asarray(first[0][:1]), jnp.asarray(first[1][:1, :-1])
        )
        best_path = os.path.join(exp_dir, "valid_best.params")
        if not os.path.exists(best_path):
            raise FileNotFoundError(f"{best_path} (train first)")
        restored = ckpt.load_state(
            best_path,
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        logging.info("loaded %s", best_path)

        # --num_devices > 1 shards the beam decode over a data-axis mesh
        # (same translator path as train_gnmt's per-epoch eval; the reference
        # evaluator is single-device, evaluate_gnmt.py:95-98)
        num_data = max(FLAGS.num_devices, 1)
        mesh = None
        eval_sharding = None
        if num_data > 1:
            from tennis_tpu.parallel import (batch_sharding, make_mesh,
                                             replicated)

            mesh = make_mesh(num_data=num_data,
                             devices=jax.devices()[:num_data])
            eval_sharding = batch_sharding(mesh)
            # place the checkpointed host params on the mesh ONCE — otherwise
            # every translate call re-uploads the whole tree to every device
            params, batch_stats = jax.device_put(
                (params, batch_stats), replicated(mesh))

        translator = BeamSearchTranslator(
            model, bos_id=vocab[vocab.bos_token], eos_id=vocab[vocab.eos_token],
            beam_size=FLAGS.beam_size, alpha=FLAGS.lp_alpha, K=FLAGS.lp_k,
            max_length=FLAGS.tgt_max_len + 20, mesh=mesh,
        )
        from tennis_tpu.data.loader import prefetch_to_device

        def batches():
            # only (src, src_vl) go to device; indices stay host-side (list
            # leaves pass through prefetch untouched — no round trip back).
            # Under a mesh, ragged tails pad up to the device count so the
            # sharded transfer is legal; the pad rows are sliced off below.
            for src, _tgt, src_vl, _tgt_vl, idxs in iter(loader):
                if mesh is not None and len(idxs) % num_data:
                    from tennis_tpu.parallel import pad_batch

                    (src, src_vl), _ = pad_batch((src, src_vl), num_data)
                yield (src, src_vl), idxs.tolist()

        hyps, order = [], []
        # transfers overlap the previous batch's beam decode
        for (src, src_vl), idxs in prefetch_to_device(batches(), eval_sharding):
            hyps.extend(translator.translate_tokens(
                {"params": params, "batch_stats": batch_stats}, src, src_vl,
                vocab,
            )[:len(idxs)])
            order.extend(idxs)
        ordered = [None] * len(hyps)
        for pos, ds_idx in enumerate(order):
            ordered[ds_idx] = hyps[pos]
        hyps = ordered
        _write_sentences(hyps, cached)

    suite = nlg_metric_suite([[t] for t in test_tgt], hyps)
    for k, v in suite.items():
        logging.info("test %s=%.4f", k, v)
    if FLAGS.metrics_out:
        import json

        with open(FLAGS.metrics_out, "w") as f:
            json.dump(suite, f)
    return suite


def main(argv=None):
    FLAGS(argv if argv is not None else sys.argv)
    return evaluate()


if __name__ == "__main__":
    main()
