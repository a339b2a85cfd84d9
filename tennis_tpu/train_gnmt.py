"""Captioning trainer (CLI-compatible with the reference train_gnmt.py).

Reference surface: flags train_gnmt.py:48-119, model build :145-229, loop :305-496.
TPU-native differences: the per-step Python RNN unrolls become scanned layers, beam
search runs as one jitted program per bucket shape, and batches arrive uint8/float32
through the bucketed loader with static per-bucket shapes (one compile per bucket).

Uses a module-local flag namespace so it can coexist in-process with
tennis_tpu.train (the reference keeps the same flag names with different defaults
in each script).

Run: ``python -m tennis_tpu.train_gnmt --model_id 0102 --feats_model 0006 ...``
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
from absl import flags, logging

FLAGS = flags.FlagValues()

flags.DEFINE_string("root", "data", "Dataset root", flag_values=FLAGS)
flags.DEFINE_string("model_id", "0000", "model id", flag_values=FLAGS)
flags.DEFINE_integer("epochs", 40, "training epochs", flag_values=FLAGS)
flags.DEFINE_integer("num_hidden", 128, "state dim", flag_values=FLAGS)
flags.DEFINE_integer("emb_size", 100, "embedding dim", flag_values=FLAGS)
flags.DEFINE_float("dropout", 0.2, "dropout", flag_values=FLAGS)
flags.DEFINE_integer("num_layers", 2, "encoder/decoder layers", flag_values=FLAGS)
flags.DEFINE_integer("num_bi_layers", 1, "bidirectional layers", flag_values=FLAGS)
flags.DEFINE_string("cell_type", "gru", "gru or lstm", flag_values=FLAGS)
flags.DEFINE_integer("batch_size", 128, "train batch size", flag_values=FLAGS)
flags.DEFINE_integer("beam_size", 4, "beam size", flag_values=FLAGS)
flags.DEFINE_float("lp_alpha", 1.0, "length penalty alpha", flag_values=FLAGS)
flags.DEFINE_integer("lp_k", 5, "length penalty K", flag_values=FLAGS)
flags.DEFINE_integer("test_batch_size", 32, "eval batch size", flag_values=FLAGS)
flags.DEFINE_integer("num_buckets", 5, "bucket count", flag_values=FLAGS)
flags.DEFINE_string("bucket_scheme", "constant", "constant|linear|exp",
                    flag_values=FLAGS)
flags.DEFINE_float("bucket_ratio", 0.0, "bucket throughput ratio",
                   flag_values=FLAGS)
flags.DEFINE_integer("tgt_max_len", 50, "max caption length", flag_values=FLAGS)
flags.DEFINE_string("optimizer", "adam", "optimizer", flag_values=FLAGS)
flags.DEFINE_float("lr", 1e-3, "learning rate", flag_values=FLAGS)
flags.DEFINE_float("lr_update_factor", 0.5, "LR decay factor", flag_values=FLAGS)
flags.DEFINE_float("clip", 5.0, "gradient clip", flag_values=FLAGS)
flags.DEFINE_integer("log_interval", 100, "log every N batches", flag_values=FLAGS)
flags.DEFINE_integer("num_devices", -1, "devices (num_gpus analogue)",
                     flag_values=FLAGS)
flags.DEFINE_alias("num_gpus", "num_devices",
                   flag_values=FLAGS)  # reference CLI compatibility
flags.DEFINE_string("backbone", "DenseNet121", "CNN backbone (pixels path)",
                    flag_values=FLAGS)
flags.DEFINE_string("backbone_from_id", None, "backbone weights source exp id",
                    flag_values=FLAGS)
flags.DEFINE_bool("freeze_backbone", False, "freeze backbone", flag_values=FLAGS)
flags.DEFINE_integer("data_shape", 512, "input crop side", flag_values=FLAGS)
flags.DEFINE_integer("every", 1, "every nth frame", flag_values=FLAGS)
flags.DEFINE_string("feats_model", None, "load features from this model id",
                    flag_values=FLAGS)
flags.DEFINE_string("emb_file", "embeddings-ex.txt",
                    "word-embedding file from train_embeddings.py",
                    flag_values=FLAGS)
flags.DEFINE_integer("num_workers", 8, "loader threads", flag_values=FLAGS)
flags.DEFINE_integer("frames_cache", 0,
                     "pixels path: read the pre-resized data/frames_s<N> "
                     "mirror (tennis_tpu.data.frame_cache); 0 = original tree",
                     flag_values=FLAGS)
flags.DEFINE_integer("seed", 100, "rng seed (reference seeds 100/10000)",
                     flag_values=FLAGS)
flags.DEFINE_integer("max_batches", -1, "debug batch limit", flag_values=FLAGS)
flags.DEFINE_enum("remat", "none", ["none", "block", "hires", "growth"],
                  "dense-block rematerialization for the pixels-path CNN "
                  "src_embed (DenseNet backbones)", flag_values=FLAGS)
flags.DEFINE_string("pretrained_npz", None,
                    "converted ImageNet backbone weights (.npz from "
                    "models/convert.py) for the pixels-path src_embed — the "
                    "reference starts its CNN src_embed from the gluoncv "
                    "pretrained zoo (train_gnmt.py:149-151)",
                    flag_values=FLAGS)


def build_model(vocab_size: int):
    import jax.numpy as jnp

    from tennis_tpu.models.gnmt import NMTModel, get_gnmt_encoder_decoder

    encoder, decoder = get_gnmt_encoder_decoder(
        cell_type=FLAGS.cell_type, num_layers=FLAGS.num_layers,
        num_bi_layers=FLAGS.num_bi_layers, hidden_size=FLAGS.num_hidden,
        dropout=FLAGS.dropout,
    )
    src_embed = None
    if not FLAGS.feats_model:  # None or '' — the pixels path
        from tennis_tpu.models import get_backbone

        # pixels path: TimeDistributed CNN backbone as src_embed
        # (reference train_gnmt.py:145-170)
        src_embed = get_backbone(
            FLAGS.backbone, dtype=jnp.float32,
            remat=None if FLAGS.remat == "none" else FLAGS.remat,
        )
    return NMTModel(vocab_size=vocab_size, encoder=encoder, decoder=decoder,
                    embed_size=FLAGS.emb_size, src_embed=src_embed)


def make_datasets():
    from tennis_tpu.data import TennisSet

    train_transform = test_transform = None
    if not FLAGS.feats_model:
        # pixels path: host geometry per frame — train gets RandomResizedCrop
        # (reference transform_train, train_gnmt.py:172-180; the color/lighting
        # stages run fused on device inside embed_src), eval gets
        # Resize(+32)+CenterCrop (transform_test, train_gnmt.py:182-187)
        from tennis_tpu.data import transforms as T

        rng = T.ThreadLocalRng(FLAGS.seed)  # loader workers are threads
        train_transform = lambda img: T.train_geometry(img, FLAGS.data_shape,
                                                       rng.get())
        test_transform = lambda img: T.test_geometry(img, FLAGS.data_shape)

    common = dict(root=FLAGS.root, captions=True, every=FLAGS.every,
                  feats_model=FLAGS.feats_model or None,
                  frames_cache=FLAGS.frames_cache or None)
    # eval decodes may use a bounded DCT scale; train keeps full-res for
    # RandomResizedCrop parity (see tennis_tpu/train.py make_datasets)
    decode_short = FLAGS.data_shape + 32
    data_train = TennisSet(split="train", max_cap_len=FLAGS.tgt_max_len,
                           transform=train_transform, **common)
    data_val = TennisSet(split="val", vocab=data_train.vocab, inference=True,
                         transform=test_transform, decode_short=decode_short,
                         **common)
    data_test = TennisSet(split="test", vocab=data_train.vocab, inference=True,
                          transform=test_transform, decode_short=decode_short,
                          **common)
    return data_train, data_val, data_test


def train(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from tennis_tpu.data.bucketing import BucketedCaptionLoader
    from tennis_tpu.data.vocab import load_embeddings
    from tennis_tpu.metrics.nlg import nlg_metric_suite
    from tennis_tpu.models.gnmt import masked_ce_loss
    from tennis_tpu.translation import BeamSearchTranslator
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import (
        experiment_dir, setup_logging, summary_writer,
    )

    exp_dir = experiment_dir("captioning", FLAGS.model_id)
    setup_logging(exp_dir, {name: FLAGS[name].value for name in FLAGS})
    tb = summary_writer(exp_dir)

    data_train, data_val, data_test = make_datasets()
    vocab = data_train.vocab
    logging.info("vocab size %d", len(vocab))
    logging.info(data_train.stats())

    val_tgt = data_val.get_captions(split=True)
    test_tgt = data_test.get_captions(split=True)
    _write_sentences(val_tgt, os.path.join(exp_dir, "val_gt.txt"))
    _write_sentences(test_tgt, os.path.join(exp_dir, "test_gt.txt"))

    model = build_model(len(vocab))

    # --num_devices > 1 shards training batches over a data-axis mesh (this
    # BEATS the reference, which is single-GPU only — train_gnmt.py:126-129);
    # default stays single-device for reference parity. Beam eval remains
    # single-host (sequential decode does not amortize across chips here).
    num_data = max(FLAGS.num_devices, 1)
    if num_data > 1:
        from tennis_tpu.parallel import make_mesh

        if FLAGS.batch_size % num_data:
            raise ValueError(
                f"--batch_size {FLAGS.batch_size} must divide across "
                f"{num_data} devices"
            )
        mesh = make_mesh(num_data=num_data, devices=jax.devices()[:num_data])
    else:
        mesh = None

    loaders = {
        "train": BucketedCaptionLoader(
            data_train, FLAGS.batch_size, FLAGS.num_buckets, FLAGS.bucket_scheme,
            FLAGS.bucket_ratio, shuffle=True, seed=FLAGS.seed,
            num_workers=FLAGS.num_workers, pad_multiple=8,
            batch_multiple=num_data,
        ),
        "val": BucketedCaptionLoader(
            data_val, FLAGS.test_batch_size, FLAGS.num_buckets,
            FLAGS.bucket_scheme, FLAGS.bucket_ratio, shuffle=False,
            num_workers=FLAGS.num_workers, pad_multiple=8,
            key_element=-1,  # reference val/test buckets on caption length
        ),
        "test": BucketedCaptionLoader(
            data_test, FLAGS.test_batch_size, FLAGS.num_buckets,
            FLAGS.bucket_scheme, FLAGS.bucket_ratio, shuffle=False,
            num_workers=FLAGS.num_workers, pad_multiple=8,
            key_element=-1,  # reference val/test buckets on caption length
        ),
    }

    # sample shapes from the first train batch
    try:
        first = next(iter(loaders["train"]))
    except StopIteration:
        raise SystemExit(
            "train loader produced zero batches: with --num_devices > 1 each "
            "bucket trims ragged tails to multiples of the device count "
            "(deviation D14) — lower --num_buckets or --batch_size, or add "
            "training captions"
        ) from None
    src0, tgt0 = first[0], first[1]

    rng = jax.random.PRNGKey(FLAGS.seed)
    variables = jax.jit(model.init)(
        rng, jnp.asarray(src0[:1]), jnp.asarray(tgt0[:1, :-1])
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})  # pixels path: backbone BN
    logging.info("params: %.2fM", ckpt.param_count(params) / 1e6)

    # pixels path: ImageNet-pretrained src_embed init (reference
    # train_gnmt.py:149-151 builds the CNN from the pretrained zoo); a
    # backbone_from_id transplant below overrides it, like the reference's
    # load_parameters after construction
    if FLAGS.pretrained_npz and FLAGS.feats_model:
        raise ValueError(
            "--pretrained_npz needs the pixels path; --feats_model consumes "
            "precomputed features and has no CNN src_embed to initialize"
        )
    if not FLAGS.feats_model and FLAGS.pretrained_npz:
        from tennis_tpu.models.convert import inject_npz, rebase

        flat = rebase(dict(np.load(FLAGS.pretrained_npz)), ["src_embed"])
        # ONE batched device_get (per-leaf fetches are tunnel round trips)
        params, batch_stats = jax.device_get((dict(params), dict(batch_stats)))
        params, batch_stats, n = inject_npz(params, batch_stats, flat)
        if n == 0:
            raise ValueError(
                f"no arrays from {FLAGS.pretrained_npz} matched src_embed — "
                f"wrong conversion for --backbone={FLAGS.backbone}?"
            )
        logging.info("loaded %d pretrained src_embed arrays from %s", n,
                     FLAGS.pretrained_npz)

    # pixels path: transplant a trained vision experiment's backbone into
    # src_embed (reference train_gnmt.py:152-161 loads the latest epoch params)
    if not FLAGS.feats_model and FLAGS.backbone_from_id:
        params, batch_stats = _transplant_backbone(
            dict(params), dict(batch_stats), FLAGS.backbone_from_id
        )

    # pretrained target embeddings (reference train_gnmt.py:211-218)
    emb_path = os.path.join(FLAGS.root, FLAGS.emb_file) if FLAGS.emb_file else None
    if emb_path and os.path.exists(emb_path):
        emb = load_embeddings(emb_path, vocab, FLAGS.emb_size)
        params = dict(params)
        params["tgt_embed"] = {"embedding": jnp.asarray(emb)}
        logging.info("loaded tgt embeddings from %s", emb_path)
    elif FLAGS.emb_file:
        logging.warning("embedding file %s not found; training tgt_embed from "
                        "scratch", emb_path)

    lr = FLAGS.lr

    def _make_opt(learning_rate):
        stages = []
        if FLAGS.freeze_backbone and not FLAGS.feats_model:
            # zero the CNN src_embed grads BEFORE the global-norm clip: the
            # reference's grad_req='null' (train_gnmt.py:164-166) excludes the
            # backbone from the norm entirely — masking after clip+opt was
            # measured to shrink trainable updates 63x when backbone grads
            # dominate the norm
            def frozen_mask(p):
                return {k: jax.tree_util.tree_map(lambda _: k == "src_embed", v)
                        for k, v in p.items()}

            stages.append(optax.masked(optax.set_to_zero(), frozen_mask))
        stages.append(optax.clip_by_global_norm(FLAGS.clip))
        stages.append(optax.adam(learning_rate) if FLAGS.optimizer == "adam"
                      else optax.sgd(learning_rate))
        return optax.chain(*stages)

    opt = optax.inject_hyperparams(_make_opt)(lr)
    opt_state = opt.init(params)

    # crash-safe resume: unreadable newest checkpoints are quarantined and the
    # scan falls back to the next-newest
    start_epoch, restored = ckpt.resume_state(
        exp_dir,
        {"params": params, "batch_stats": batch_stats,
         "opt_state": opt_state},
    )
    if start_epoch > 0:
        params, opt_state = restored["params"], restored["opt_state"]
        batch_stats = restored["batch_stats"]
        # resync the local decay-compounding variable from the restored
        # hyperparam: a resume inside the decay zone must keep compounding
        # from the restored LR (the reference compounds off
        # trainer.learning_rate, train_gnmt.py:456-459), not restart the
        # ×factor chain from FLAGS.lr
        lr = float(opt_state.hyperparams["learning_rate"])
        logging.info("resumed from epoch %d (lr %g)", start_epoch - 1, lr)

    # donating jitted step from the shared parallel harness (params + Adam
    # moments update in place; the dropout key derives from a host seed inside
    # the jit — zero eager device ops per batch). With --num_devices > 1 the
    # step runs DP over the mesh (batch args sharded over 'data', replicated
    # params, pjit-induced gradient all-reduce).
    from tennis_tpu.parallel import make_seq2seq_train_step

    train_step = make_seq2seq_train_step(model, opt, masked_ce_loss, mesh=mesh)

    def _eval_loss_step(params, batch_stats, src, tgt, src_vl, tgt_vl, row_w):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             src, tgt[:, :-1], src_vl, tgt_vl - 1)
        return masked_ce_loss(logits, tgt[:, 1:], tgt_vl - 1,
                              sample_weights=row_w)

    if mesh is None:
        eval_loss_step = jax.jit(_eval_loss_step)
    else:
        from tennis_tpu.parallel import batch_sharding, replicated

        _r, _b = replicated(mesh), batch_sharding(mesh)
        eval_loss_step = jax.jit(
            _eval_loss_step, in_shardings=(_r, _r, _b, _b, _b, _b, _b))

    # with --num_devices > 1 the per-epoch beam eval decodes on the SAME mesh
    # as training: batch rows shard over 'data', params stay the replicated
    # mesh arrays (no per-epoch host fetch), ragged bucket tails pad up to the
    # device count with zero-weight loss rows. The reference's eval is
    # single-device eager (train_gnmt.py:126-129, utils/translation.py:55-82).
    translator = BeamSearchTranslator(
        model, bos_id=vocab[vocab.bos_token], eos_id=vocab[vocab.eos_token],
        beam_size=FLAGS.beam_size, alpha=FLAGS.lp_alpha, K=FLAGS.lp_k,
        max_length=FLAGS.tgt_max_len + 20, mesh=mesh,
    )
    logging.info("beam_size=%d alpha=%.2f K=%d", FLAGS.beam_size, FLAGS.lp_alpha,
                 FLAGS.lp_k)

    from tennis_tpu.data.loader import prefetch_to_device

    n_data = mesh.shape["data"] if mesh is not None else 1
    eval_sharding = None if mesh is None else _b

    def evaluate(split, tgt_sentences):
        eval_params, eval_stats = params, batch_stats

        def batches():
            # indices stay host-side (list leaves pass through prefetch);
            # under a mesh every batch pads to a multiple of the data axis so
            # the sharded transfer is legal, with zero weight on pad rows
            for src, tgt, src_vl, tgt_vl, idxs in iter(loaders[split]):
                n = len(idxs)
                if n % n_data:
                    from tennis_tpu.parallel import pad_batch

                    (src, tgt, src_vl, tgt_vl), _ = pad_batch(
                        (src, tgt, src_vl, tgt_vl), n_data)
                w = (np.arange(src.shape[0]) < n).astype(np.float32)
                yield (src, tgt, src_vl, tgt_vl, w), idxs.tolist()

        losses, hyps, order = [], [], []
        # transfers overlap the beam decodes of the previous batch
        for (src, tgt, src_vl, tgt_vl, w), idxs in prefetch_to_device(
                batches(), eval_sharding):
            # keep the loss on device; one batched fetch after the loop
            losses.append(eval_loss_step(
                eval_params, eval_stats, src, tgt, src_vl, tgt_vl, w
            ))
            toks = translator.translate_tokens(
                {"params": eval_params, "batch_stats": eval_stats}, src, src_vl,
                vocab,
            )
            hyps.extend(toks[:len(idxs)])
            order.extend(idxs)
        losses = [float(l) for l in jax.device_get(losses)]
        # restore dataset order (buckets permute samples)
        hyps_ordered = [None] * len(hyps)
        for pos, ds_idx in enumerate(order):
            hyps_ordered[ds_idx] = hyps[pos]
        suite = nlg_metric_suite([[t] for t in tgt_sentences], hyps_ordered)
        return float(np.mean(losses)), suite, hyps_ordered

    best_bleu = -1.0
    seed_rng = np.random.default_rng(FLAGS.seed + 1)
    # epoch + valid_best checkpoints stream from a background writer (snapshot
    # stays synchronous; writes land in submission order)
    # context manager: pending writes drain and the worker shuts down on
    # ALL exits (incl. a mid-loop exception) — same-process readers
    # (evaluate_gnmt chains) then always see durable files
    with ckpt.AsyncCheckpointer() as ckpt_writer:
        for epoch in range(start_epoch, FLAGS.epochs):
            loaders["train"].set_epoch(epoch)
            tic = time.time()
            n_tokens, n_batches = 0, 0
            # host batches transfer on a background thread while the previous step
            # computes (the raw step runs at ~413K words/sec at B=128 T=120 — the
            # loop must not stall it on PCIe). Token counts are taken on host
            # BEFORE transfer: summing a device array here would be an eager per-op
            # round trip (see CLAUDE.md on the tunneled TPU).
            def counted_batches():
                for batch in iter(loaders["train"]):
                    yield batch, int(np.asarray(batch[3]).sum())

            train_sharding = None
            if mesh is not None:
                from tennis_tpu.parallel import batch_sharding

                train_sharding = batch_sharding(mesh)
            for batch, batch_tokens in prefetch_to_device(counted_batches(),
                                                          train_sharding):
                src, tgt, src_vl, tgt_vl = batch[:4]
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, src, tgt, src_vl, tgt_vl,
                    np.uint32(seed_rng.integers(2**31)),
                )
                n_batches += 1
                n_tokens += batch_tokens
                if n_batches % FLAGS.log_interval == 0 or n_batches == 1:
                    loss_v = float(loss)
                    wps = n_tokens / max(time.time() - tic, 1e-6)
                    logging.info("[Epoch %d][Batch %d] loss=%.4f ppl=%.2f %.1fK wps",
                                 epoch, n_batches, loss_v, np.exp(min(loss_v, 20)),
                                 wps / 1000)
                    if tb:
                        tb.add_scalar("train/loss", loss_v, epoch * 10000 + n_batches)
                if 0 < FLAGS.max_batches <= n_batches:
                    break

            val_loss, val_suite, val_hyps = evaluate("val", val_tgt)
            test_loss, test_suite, test_hyps = evaluate("test", test_tgt)
            bleu4 = val_suite["Bleu_4"] * 100
            logging.info("[Epoch %d] val loss=%.4f BLEU4=%.2f suite=%s (%.1fs)",
                         epoch, val_loss, bleu4,
                         {k: round(v, 4) for k, v in val_suite.items()},
                         time.time() - tic)
            if tb:
                for k, v in val_suite.items():
                    tb.add_scalar(f"val/{k}", v, epoch)
                for k, v in test_suite.items():
                    tb.add_scalar(f"test/{k}", v, epoch)
                # GT-vs-pred text panels + target-embedding projector dump
                # (reference train_gnmt.py:364-370,398-400)
                from tennis_tpu.utils.captioning import get_comp_str

                tb.add_text("val/captions",
                            get_comp_str(val_tgt[:8], val_hyps[:8]), epoch)
                try:
                    emb = np.asarray(params["tgt_embed"]["embedding"])
                    tb.add_embedding(emb, metadata=vocab.idx_to_token,
                                     tag="tgt_embed", global_step=epoch)
                except Exception:  # projector support is best-effort
                    pass

            _write_sentences(val_hyps, os.path.join(exp_dir, f"epoch{epoch}_val_out.txt"))
            _write_sentences(test_hyps,
                             os.path.join(exp_dir, f"epoch{epoch}_test_out.txt"))
            # LR decay ×factor each epoch in the last third (reference
            # train_gnmt.py:456-459). Applied BEFORE this epoch's checkpoint so the
            # saved hyperparam is exactly the LR the next epoch trains with — a
            # resume then restores the decay chain losslessly (it sits between
            # epochs either way, so continuous-run behavior is unchanged).
            if epoch + 1 >= (FLAGS.epochs * 2) // 3:
                lr *= FLAGS.lr_update_factor
                opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)
                logging.info("lr decayed to %g", lr)
            ckpt_writer.save(ckpt.epoch_path(exp_dir, epoch),
                             {"params": params, "batch_stats": batch_stats,
                              "opt_state": opt_state})
            # scores.txt row lands only after its epoch file is durable
            ckpt_writer.submit(
                lambda e=epoch, s=bleu4: ckpt.append_score(exp_dir, e, s))
            if bleu4 > best_bleu:
                best_bleu = bleu4
                # no optimizer state: the evaluator restores params + stats only
                ckpt_writer.save(os.path.join(exp_dir, "valid_best.params"),
                                 {"params": params, "batch_stats": batch_stats})
                _write_sentences(test_hyps, os.path.join(exp_dir, "best_test_out.txt"))
                logging.info("new best BLEU4 %.2f at epoch %d", bleu4, epoch)

    return params


def _transplant_backbone(params, batch_stats, from_id):
    """Load the newest vision-experiment checkpoint and graft its backbone
    subtree (params + BN stats) onto ``src_embed`` (reference
    train_gnmt.py:152-161: FrameModel.load_parameters of the latest epoch, then
    ``cnn_model.backbone`` becomes the TimeDistributed src_embed)."""
    import jax

    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    src_dir = experiment_dir("vision", from_id)
    latest = ckpt.latest_epoch(src_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoints under {src_dir}")
    raw = ckpt.load_raw(ckpt.epoch_path(src_dir, latest))
    donor_params = raw["params"]["backbone"]
    donor_stats = raw.get("batch_stats", {}).get("backbone", {})

    def check(donor, mine, what):
        d = jax.tree_util.tree_structure(donor)
        m = jax.tree_util.tree_structure(mine)
        if d != m:
            raise ValueError(
                f"backbone {what} from experiment {from_id} do not match this "
                f"--backbone={FLAGS.backbone}: {d} vs {m}"
            )

    check(donor_params, params["src_embed"], "params")
    params["src_embed"] = jax.tree_util.tree_map(jnp_array, donor_params)
    if donor_stats:
        check(donor_stats, batch_stats["src_embed"], "batch_stats")
        batch_stats["src_embed"] = jax.tree_util.tree_map(jnp_array, donor_stats)
    logging.info("transplanted backbone from %s epoch %d", from_id, latest)
    return params, batch_stats


def jnp_array(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def _write_sentences(sentences, path):
    with open(path, "w", encoding="utf-8") as f:
        for s in sentences:
            f.write((" ".join(s) if isinstance(s, (list, tuple)) else str(s)) + "\n")


def main(argv=None):
    # reset between in-process invocations: absl FlagValues keep previously
    # parsed values for flags the new argv doesn't mention
    FLAGS.unparse_flags()
    FLAGS(argv if argv is not None else sys.argv)
    return train()


if __name__ == "__main__":
    main()
