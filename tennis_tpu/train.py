"""Event-classifier training driver (CLI-compatible with the reference train.py).

Mirrors the reference's flag surface and experiment conventions
(reference train.py:32-93 flags; :96-385 main; :388-499 train_model; :503-527
test_model; :530-545 save_features) on the TPU-native stack:

- data: TennisSet index → threaded uint8 loader → device prefetch → fused on-device
  augment/normalize (tennis_tpu.data.transforms) inside the jitted step;
- model: composed from flags exactly like the reference (backbone / FrameModel /
  TwoStream / CNNRNN / TemporalPooling / R(2+1)D);
- parallelism: DP over a (data, model) mesh, jit with donated state;
- metrics: accuracy variants + PRF1; AVG_NB_f1 drives model selection via scores.txt;
- checkpoints: {epoch:04d}.params + resume + best-epoch, per utils.checkpoint.

Run: ``python -m tennis_tpu.train --model_id 0006 --backbone DenseNet121 ...``
"""
from __future__ import annotations

import os
import time

import numpy as np
from absl import app, flags, logging

FLAGS = flags.FLAGS

flags.DEFINE_string("root", "data", "Dataset root directory")
flags.DEFINE_string("backbone", "resnet18_v2", "Backbone CNN name")
flags.DEFINE_string("backbone_from_id", None,
                    "Load backbone weights from another experiment id")
flags.DEFINE_bool("freeze_backbone", False, "Freeze the backbone model")
flags.DEFINE_string("model_id", "0000", "model identification string")
flags.DEFINE_string("split_id", "02", "split id: 01 or 02")
flags.DEFINE_integer("log_interval", 100, "Logging mini-batch interval")
flags.DEFINE_integer("data_shape", 512, "Input crop side")
flags.DEFINE_list("every", "1,1,1", "Use every nth frame: [train, val, test]")
flags.DEFINE_list("balance", "True,False,False", "Balance classes per split")
flags.DEFINE_integer("window", 1, "Temporal window size")
flags.DEFINE_integer("padding", 1, "Padding around event boundaries (parity flag)")
flags.DEFINE_integer("stride", 1, "Temporal stride within a window")
flags.DEFINE_integer("batch_size", 64, "Global batch size")
flags.DEFINE_integer("epochs", 20, "Training epochs")
flags.DEFINE_integer("num_devices", -1,
                     "Devices for the data axis (-1 = all; the num_gpus analogue)")
flags.DEFINE_alias("num_gpus", "num_devices")  # reference CLI compatibility
flags.DEFINE_integer("num_workers", -1, "Host loader threads (-1 = auto)")
flags.DEFINE_float("lr", 0.001, "Learning rate")
flags.DEFINE_float("lr_factor", 0.75, "LR step factor")
flags.DEFINE_list("lr_steps", "10,20", "Epochs at which the LR factor applies")
flags.DEFINE_float("momentum", 0.9, "SGD momentum")
flags.DEFINE_float("wd", 0.0001, "Weight decay")
flags.DEFINE_bool("vis", False, "Visualise test results")
flags.DEFINE_bool("save_feats", False, "Save backbone features as .npy")
flags.DEFINE_string("feats_model", None, "Load features from this model id")
flags.DEFINE_string("flow", "", "'' | 'only' | 'sixc' | 'twos'")
flags.DEFINE_string("temp_pool", None, "mean, max, gru or lstm")
flags.DEFINE_integer("max_batches", -1, "Limit batches per epoch (debug)")
flags.DEFINE_string("pretrained_npz", None,
                    "Optional converted pretrained backbone weights (.npz)")
flags.DEFINE_integer("seed", 0, "Global RNG seed")
flags.DEFINE_integer("frames_cache", 0,
                     "Read frames from the pre-resized data/frames_s<N> mirror "
                     "(short side N, typically data_shape+32; build once with "
                     "python -m tennis_tpu.data.frame_cache). 0 reads the "
                     "original tree; missing cache files fall back per file. "
                     "No effect on --flow paths (full-res concat).")
flags.DEFINE_integer("profile_steps", 0,
                     "Capture a jax.profiler trace of this many train steps into "
                     "<exp_dir>/tb/profile (view with xprof/tensorboard)")
flags.DEFINE_bool("multihost", False,
                  "Initialize jax.distributed and build a DCN×ICI pod mesh; "
                  "every host runs this same command (parallel/distributed.py)")
flags.DEFINE_string("coordinator", None,
                    "multihost coordinator address host:port (omit on TPU pods "
                    "— auto-discovered)")
flags.DEFINE_integer("num_hosts", None, "multihost process count (omit on pods)")
flags.DEFINE_integer("host_id", None, "this process's index (omit on pods)")
flags.DEFINE_enum("remat", "none", ["none", "block", "hires", "growth"],
                  "Dense-block rematerialization (DenseNet backbones): trades "
                  "recompute for activation memory so larger batches fit")


def build_model(num_classes: int, feats: bool):
    """Compose the model from flags (reference train.py:196-241)."""
    import jax.numpy as jnp

    from tennis_tpu.models import CNNRNN, FrameModel, TwoStreamModel, get_backbone

    dtype = jnp.bfloat16
    temp_pool = FLAGS.temp_pool
    remat = None if FLAGS.remat == "none" else FLAGS.remat
    if remat and not (FLAGS.backbone.lower().startswith("densenet")
                      or FLAGS.backbone.lower() == "rdnet"):
        raise ValueError("--remat supports DenseNet and rdnet backbones only")
    if feats:
        base = None
    elif FLAGS.backbone.lower() == "rdnet":
        from tennis_tpu.models.r21d import get_r21d

        assert FLAGS.window in (8, 32), "rdnet needs --window 8 or 32"
        if remat not in (None, "block"):
            raise ValueError("rdnet supports --remat block only (per residual "
                             "block); hires/growth are DenseNet policies")
        base = get_r21d(num_layers=34, n_classes=num_classes, t=FLAGS.window,
                        dtype=dtype, remat=remat == "block")
        return FrameModel(base, num_classes, dtype=dtype)
    elif FLAGS.flow in ("twos", "only"):
        rgb = None if FLAGS.flow == "only" else get_backbone(
            FLAGS.backbone, dtype=dtype, remat=remat)
        flow_net = get_backbone(FLAGS.backbone, dtype=dtype, remat=remat)
        return TwoStreamModel(rgb, flow_net, num_classes, dtype=dtype)
    else:
        base = FrameModel(get_backbone(FLAGS.backbone, dtype=dtype, remat=remat),
                          dtype=dtype)

    if FLAGS.window > 1 and temp_pool in ("gru", "lstm"):
        return CNNRNN(model=base, num_classes=num_classes, hidden_size=128,
                      cell_type=temp_pool, dtype=dtype)
    if temp_pool in ("max", "mean"):
        from tennis_tpu.models import TemporalPooling

        return TemporalPooling(model=base, num_classes=num_classes, pool=temp_pool,
                               feats=feats, dtype=dtype)
    if feats:
        raise ValueError("--feats_model requires --temp_pool (gru/lstm/max/mean)")
    return FrameModel(get_backbone(FLAGS.backbone, dtype=dtype, remat=remat),
                      num_classes, dtype=dtype)


def _sample_shape(num_classes: int, feats: bool, feat_dim: int):
    c = 6 if FLAGS.flow else 3
    if feats:
        if FLAGS.window > 1:
            return (1, FLAGS.window, feat_dim)
        return (1, feat_dim)
    if FLAGS.window > 1:
        return (1, FLAGS.window, FLAGS.data_shape, FLAGS.data_shape, c)
    return (1, FLAGS.data_shape, FLAGS.data_shape, c)


def make_datasets():
    from tennis_tpu.data import TennisSet

    every = [int(s) for s in FLAGS.every]
    balance = [str(s).strip().lower() in ("true", "t") for s in FLAGS.balance]
    # balancing stays ON for window>1 (the reference only disables it for
    # --save_feats, train.py:130,159-160; window>1 disables *augmentation*,
    # train.py:163-165, which _geometry_transform handles separately). Deviation
    # kept: the reference hardcodes balance_train=True ignoring --balance[0]; we
    # honor the flag (default True → same behavior). See PARITY.md.
    balance_train = balance[0] and not FLAGS.save_feats

    common = dict(
        root=FLAGS.root, split_id=FLAGS.split_id, padding=FLAGS.padding,
        stride=FLAGS.stride, window=FLAGS.window, model_id=FLAGS.model_id,
        flow=bool(FLAGS.flow), feats_model=FLAGS.feats_model or None,
        save_feats=FLAGS.save_feats, frames_cache=FLAGS.frames_cache or None,
    )
    # eval-path decodes may use a bounded DCT scale (tennis_set._read_image_rgb);
    # the train split keeps full-res decode while RandomResizedCrop applies
    # (reference crops from the full-res image)
    decode_short = FLAGS.data_shape + 32
    train_decode = (
        decode_short
        if (FLAGS.window > 1 or FLAGS.flow or FLAGS.save_feats) else None
    )
    train_set = TennisSet(split="train", every=every[0], balance=balance_train,
                          balance_seed=FLAGS.seed, decode_short=train_decode,
                          **common)
    val_set = make_eval_dataset("val", every_n=every[1])
    test_set = make_eval_dataset("test")
    return train_set, val_set, test_set


def make_eval_dataset(split: str, every_n: int | None = None):
    """One split with test-time settings — no balancing, bounded-DCT decode,
    ``every[2]`` subsampling unless overridden (reference evaluate.py:40-41,107:
    ``--split`` picks the evaluated split but always uses the test-split
    ``every`` and transform)."""
    from tennis_tpu.data import TennisSet

    every = [int(s) for s in FLAGS.every]
    return TennisSet(
        split=split, every=every[2] if every_n is None else every_n,
        balance=False, decode_short=FLAGS.data_shape + 32,
        root=FLAGS.root, split_id=FLAGS.split_id, padding=FLAGS.padding,
        stride=FLAGS.stride, window=FLAGS.window, model_id=FLAGS.model_id,
        flow=bool(FLAGS.flow), feats_model=FLAGS.feats_model or None,
        save_feats=FLAGS.save_feats, frames_cache=FLAGS.frames_cache or None,
    )


def _geometry_transform(train: bool):
    """Host-side geometry for raw-frame datasets; features pass through."""
    from tennis_tpu.data import transforms as T

    rng = T.ThreadLocalRng(FLAGS.seed + (1 if train else 2))

    def apply(sample):
        img, label, idx = sample
        if img.ndim == 2 or (img.ndim == 3 and img.shape[-1] in (3, 6)):
            # --save_feats forces the deterministic test transform on the train
            # split too (reference train.py:159-161: transform_train =
            # transform_test), so dumped features are crop-stable
            if (train and FLAGS.window == 1 and not FLAGS.flow
                    and not FLAGS.save_feats):
                img = T.train_geometry(img, FLAGS.data_shape, rng.get())
            else:
                img = T.test_geometry(img, FLAGS.data_shape)
        elif img.ndim == 4:  # (T, H, W, C) window clip
            img = np.stack([T.test_geometry(f, FLAGS.data_shape) for f in img])
        return img, label, idx

    return apply


def train_and_evaluate():
    import jax
    import jax.numpy as jnp
    import optax

    from tennis_tpu.data.loader import (
        DataLoader, prefetch_to_device, sharded_eval_iter,
    )
    from tennis_tpu.data.transforms import device_augment, device_prepare
    from tennis_tpu.parallel.distributed import (
        fetch_global, fetch_local, host_batch_slice, initialize_multihost,
        make_pod_mesh,
    )
    from tennis_tpu.models import backbone_feature_dim
    from tennis_tpu.parallel import (
        batch_sharding, create_train_state, make_eval_step, make_mesh,
        make_train_step, sgd_with_schedule,
    )
    from tennis_tpu.parallel.sharding_rules import state_shardings
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import (
        experiment_dir, setup_logging, summary_writer,
    )

    if FLAGS.multihost:
        initialize_multihost(FLAGS.coordinator, FLAGS.num_hosts, FLAGS.host_id)

    exp_dir = experiment_dir("vision", FLAGS.model_id)
    setup_logging(exp_dir, {k: FLAGS[k].value for k in FLAGS})
    tb = summary_writer(exp_dir)

    train_set, val_set, test_set = make_datasets()
    logging.info(train_set)
    logging.info(val_set)
    logging.info(test_set)

    feats = bool(FLAGS.feats_model)
    num_classes = train_set.num_class
    feat_dim = backbone_feature_dim(FLAGS.backbone, FLAGS.data_shape)
    # --temp_pool max|mean runs NO training (reference train.py:326-331 skips
    # train_model): it is the final-test wrap of a framewise-trained donor
    pooled_test_only = FLAGS.temp_pool in ("max", "mean") and not FLAGS.save_feats
    model = None if pooled_test_only else build_model(num_classes, feats)

    # --batch_size is GLOBAL (reference semantics); each host's loader yields its
    # 1/process_count stripe of every global batch (agreed seeded permutations)
    num_workers = FLAGS.num_workers if FLAGS.num_workers > 0 else (os.cpu_count() or 8)
    host_batch = FLAGS.batch_size
    if jax.process_count() > 1:
        host_batch = host_batch_slice(FLAGS.batch_size)
    loaders = {}
    for name, ds, train_flag in (
        ("train", train_set, True), ("val", val_set, False), ("test", test_set, False)
    ):
        loaders[name] = DataLoader(
            ds, batch_size=host_batch, shuffle=train_flag, seed=FLAGS.seed,
            num_workers=num_workers, drop_last=train_flag,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            transform=None if feats else _geometry_transform(train_flag),
        )

    if FLAGS.multihost:
        mesh = make_pod_mesh()
        num_data = mesh.shape["data"]
    else:
        devices = jax.devices()
        num_data = FLAGS.num_devices if FLAGS.num_devices > 0 else len(devices)
        mesh = make_mesh(num_data=num_data, devices=devices[:num_data])
    if FLAGS.batch_size % num_data:
        raise ValueError(
            f"--batch_size {FLAGS.batch_size} must divide across {num_data} devices"
        )
    bsharding = batch_sharding(mesh)
    logging.info("mesh: %s over %d devices (%d processes)", dict(mesh.shape),
                 mesh.devices.size, jax.process_count())

    if pooled_test_only:
        return _pooled_final_test(test_set, loaders["test"], mesh, bsharding,
                                  host_batch)

    steps_per_epoch = max(1, len(loaders["train"]))
    lr_steps = [int(s) for s in FLAGS.lr_steps]
    tx, _ = sgd_with_schedule(FLAGS.lr, FLAGS.momentum, FLAGS.wd, lr_steps,
                              FLAGS.lr_factor, steps_per_epoch)
    if FLAGS.freeze_backbone:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if any(getattr(k, "key", None) == "backbone" for k in path)
                else "train",
                params,
            ),
        )

    rng = jax.random.PRNGKey(FLAGS.seed)
    sample = jnp.zeros(_sample_shape(num_classes, feats, feat_dim), jnp.float32)
    # created under one jit, directly with its production shardings
    state = create_train_state(model, rng, sample, tx, {"train": True}, mesh=mesh)
    sh_state = state_shardings(mesh, state)
    logging.info("params: %.2fM", ckpt.param_count(state.params) / 1e6)

    if FLAGS.backbone_from_id:
        state = _load_backbone_from(state, FLAGS.backbone_from_id)
    if FLAGS.pretrained_npz:
        state = _load_pretrained_backbone(state, model, FLAGS.pretrained_npz)

    # resume (crash-safe: unreadable newest checkpoints are quarantined and
    # the scan falls back to the next-newest)
    start_epoch, state = ckpt.resume_state(exp_dir, state)
    if start_epoch > 0:
        logging.info("resumed from epoch %d", start_epoch - 1)

    if FLAGS.save_feats:
        # dump from the BEST epoch when scores exist (reference train.py:266-284),
        # not merely the newest checkpoint
        best = ckpt.best_epoch(exp_dir)
        if best is not None:
            state = ckpt.load_state(ckpt.epoch_path(exp_dir, best[0]), state)
            logging.info("dumping features from best epoch %d (score=%.4f)",
                         best[0], best[1])
        # the dump must cover EVERY sample: the train loader above is built
        # for SGD (shuffle + drop_last), which would silently skip up to
        # batch_size-1 arbitrary train samples — the reference's loader keeps
        # the ragged last batch (reference train.py:187-188)
        loaders = dict(loaders)
        loaders["train"] = DataLoader(
            train_set, batch_size=host_batch, shuffle=False, seed=FLAGS.seed,
            num_workers=num_workers, drop_last=False,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
            transform=None if feats else _geometry_transform(True),
        )
        save_features(model, state, [train_set, val_set, test_set], loaders, mesh)
        return state

    def _prepare(images):
        """uint8 NHWC(+window) → normalized bf16, inside the jit."""
        if images.dtype != jnp.uint8:
            return images
        flat = images.reshape((-1,) + images.shape[-3:])
        return device_prepare(flat).reshape(images.shape)

    def train_preprocess(images, key):
        if not feats and images.dtype == jnp.uint8 and images.ndim == 4 \
                and not FLAGS.flow:
            return device_augment(images, key)
        return _prepare(images)

    from tennis_tpu.parallel.mesh import driver_compiler_options

    step_opts = driver_compiler_options(FLAGS.backbone, mesh)
    train_step = make_train_step(
        model, mesh=mesh, preprocess=train_preprocess,
        rng_seed=FLAGS.seed + 123, state_sharding=sh_state,
        compiler_options=step_opts,
    )
    eval_step = make_eval_step(model, mesh=mesh, preprocess=_prepare,
                               state_sharding=sh_state,
                               compiler_options=step_opts)

    def run_eval(split):
        metrics = _metric_set(test_set.classes)
        # pad → prefetch → step → gather → drop wrap-padded duplicates: the
        # shared sharded eval loop (pod-mode metrics equal a single-host pass)
        for logits, labels, _ in sharded_eval_iter(
                loaders[split], host_batch, len(loaders[split].dataset),
                bsharding,
                lambda images: eval_step(state.params, state.batch_stats,
                                         images)):
            for m in metrics.values():
                m.update(labels, logits)
        return metrics

    profile_left = FLAGS.profile_steps
    # epoch checkpoints stream to disk from a background writer; the snapshot
    # (device_get) stays synchronous so the next donated step can't invalidate
    # the buffers mid-save
    # context manager: pending writes drain and the worker shuts down on
    # ALL exits, including a mid-loop exception (no leaked writer thread)
    with ckpt.AsyncCheckpointer() as ckpt_writer:
        for epoch in range(start_epoch, FLAGS.epochs):
            loaders["train"].set_epoch(epoch)
            tic = time.time()
            n_samples, n_batches = 0, 0
            train_metrics = _metric_set(train_set.classes)
            for images, labels, _ in prefetch_to_device(iter(loaders["train"]),
                                                        bsharding):
                if profile_left > 0 and n_batches == 1:  # skip the compile step
                    with jax.profiler.trace(os.path.join(exp_dir, "tb", "profile")):
                        for _ in range(profile_left):
                            state, loss, logits = train_step(state, images, labels)
                        jax.device_get(loss)
                    profile_left = 0
                    logging.info("profiler trace written to %s/tb/profile", exp_dir)
                state, loss, logits = train_step(state, images, labels)
                n_batches += 1
                n_samples += labels.shape[0]
                if n_batches % FLAGS.log_interval == 0 or n_batches == 1:
                    loss_v = float(loss)
                    train_metrics["prf1"].update(*fetch_global((labels, logits)))
                    rate = n_samples / max(time.time() - tic, 1e-6)
                    logging.info(
                        "[Epoch %d][Batch %d] loss=%.4f %.1f samples/sec",
                        epoch, n_batches, loss_v, rate,
                    )
                    if tb:
                        step_i = int(state.step)
                        tb.add_scalar("train/loss", loss_v, step_i)
                        tb.add_scalar("train/samples_per_sec", rate, step_i)
                if 0 < FLAGS.max_batches <= n_batches:
                    break

            train_f1 = train_metrics["prf1"].get_dict()["AVG_NB_f1"]
            if tb:
                tb.add_scalar("train/AVG_NB_f1", train_f1, epoch)
            logging.info("[Epoch %d] train AVG_NB_f1=%.4f (sampled at log intervals)",
                         epoch, train_f1)

            val_metrics = run_eval("val")
            scores = val_metrics["prf1"].get_dict()
            score = scores["AVG_NB_f1"]
            accs = {
                name: m.get()[1]
                for name, m in val_metrics.items() if name != "prf1"
            }
            logging.info("[Epoch %d] val AVG_NB_f1=%.4f %s (%.1fs)", epoch, score,
                         {k: round(v, 4) for k, v in accs.items()},
                         time.time() - tic)
            if tb:
                tb.add_scalar("val/AVG_NB_f1", score, epoch)
            ckpt_writer.save(ckpt.epoch_path(exp_dir, epoch), state)
            # the scores.txt row becomes durable only AFTER its epoch file does —
            # a crash in between can hide an epoch but never dangle a best-epoch row
            ckpt_writer.submit(
                lambda e=epoch, s=score: ckpt.append_score(exp_dir, e, s))


    # final test with the best epoch
    best = ckpt.best_epoch(exp_dir)
    if best is not None:
        state = ckpt.load_state(ckpt.epoch_path(exp_dir, best[0]), state)
        logging.info("loaded best epoch %d (AVG_NB_f1=%.4f)", best[0], best[1])
    test_metrics = run_eval("test")
    for name, m in test_metrics.items():
        if name != "prf1":
            logging.info("test %s=%.4f", *m.get())
    for name, value in test_metrics["prf1"].get():
        logging.info("test %s=%.4f", name, value)
    logging.info("confusion:\n%s", test_metrics["prf1"].confusion_str())
    return state


def _metric_set(class_names):
    from tennis_tpu.metrics import PRF1, Accuracy, TopKAccuracy

    return {
        "acc": Accuracy(),
        "acc_nb": Accuracy("accuracy_no_bg", ignore_labels=[0]),
        "acc_b": Accuracy("accuracy_bg", ignore_labels=list(range(1, len(class_names)))),
        "top5": TopKAccuracy(5),
        "prf1": PRF1(class_names),
    }


def _pooled_final_test(test_set, loader, mesh, bsharding, host_batch):
    """--temp_pool max|mean final test (reference train.py:326-350): no training.
    Loads the framewise-trained donor — best epoch of the --feats_model
    experiment, else newest of --backbone_from_id — pools BACKBONE features over
    the window, then applies the donor's own trained head (the reference's
    ``TemporalPooling(num_classes=0)`` wrap, definitions.py:52-55)."""
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.loader import sharded_eval_iter
    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    if not (FLAGS.backbone_from_id or FLAGS.feats_model):
        raise ValueError(
            "--temp_pool max|mean evaluates a pretrained net: pass "
            "--feats_model or --backbone_from_id (reference train.py:349)"
        )
    if FLAGS.window <= 1:
        raise ValueError("--temp_pool max|mean needs --window > 1")
    feats = bool(FLAGS.feats_model)
    inner = FrameModel(get_backbone(FLAGS.backbone, dtype=jnp.bfloat16),
                       test_set.num_class, dtype=jnp.bfloat16)
    tx, _ = sgd_with_schedule(FLAGS.lr)
    c = 6 if FLAGS.flow else 3
    sample = jnp.zeros((1, FLAGS.data_shape, FLAGS.data_shape, c), jnp.float32)
    state = create_train_state(inner, jax.random.PRNGKey(FLAGS.seed), sample, tx,
                               {"train": True}, mesh=mesh)

    if FLAGS.feats_model:
        src_dir = experiment_dir("vision", FLAGS.feats_model)
        best = ckpt.best_epoch(src_dir)
        if best is None:
            raise FileNotFoundError(f"no scores.txt in {src_dir}")
        state = ckpt.load_state(ckpt.epoch_path(src_dir, best[0]), state)
        logging.info("testing best donor epoch %d (score=%.4f) from %s",
                     best[0], best[1], FLAGS.feats_model)
    else:
        src_dir = experiment_dir("vision", FLAGS.backbone_from_id)
        latest = ckpt.latest_epoch(src_dir)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints in {src_dir}")
        state = ckpt.load_state(ckpt.epoch_path(src_dir, latest), state)
        logging.info("testing donor epoch %d from %s", latest,
                     FLAGS.backbone_from_id)

    pool = FLAGS.temp_pool
    from functools import partial

    from tennis_tpu.parallel.mesh import driver_compiler_options

    _opts = driver_compiler_options(FLAGS.backbone, mesh)

    # the reference's TemporalPooling(num_classes=0) wrap, through the module
    # (pool the donor's backbone features over time, then its trained head)
    from tennis_tpu.models import TemporalPooling

    tp = TemporalPooling(model=inner, pool=pool, feats=feats, wrap_head=True)

    @partial(jax.jit, compiler_options=_opts)
    def pool_step(params, batch_stats, x):
        if not feats and x.dtype == jnp.uint8:  # (B, T, H, W, C) uint8 clips
            flat = x.reshape((-1,) + x.shape[-3:])
            x = device_prepare(flat).reshape(x.shape)
        return tp.apply(
            {"params": {"model": params}, "batch_stats": {"model": batch_stats}},
            x, train=False,
        )

    metrics = _metric_set(test_set.classes)
    tic = time.time()

    for logits, labels, _ in sharded_eval_iter(
            loader, host_batch, len(test_set), bsharding,
            lambda images: pool_step(state.params, state.batch_stats, images)):
        for m in metrics.values():
            m.update(labels, logits)

    for name, m in metrics.items():
        if name != "prf1":
            logging.info("test %s=%.4f", *m.get())
    for name, value in metrics["prf1"].get():
        logging.info("test %s=%.4f", name, value)
    logging.info("confusion:\n%s", metrics["prf1"].confusion_str())
    logging.info("# Samples: %d, Time Taken: %.1f", len(test_set),
                 time.time() - tic)
    return metrics


def save_features(model, state, datasets, loaders, mesh):
    """Dump backbone features as .npy mirroring the frames layout
    (reference train.py:530-545, dataset.py:140-150)."""
    if not hasattr(model, "features"):
        raise ValueError(
            "--save_feats needs a backbone-bearing model (FrameModel); it cannot "
            "be combined with --temp_pool/--feats_model configurations"
        )
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.loader import prefetch_to_device
    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.parallel import batch_sharding
    from tennis_tpu.parallel.distributed import fetch_local

    from functools import partial

    from tennis_tpu.parallel.mesh import driver_compiler_options

    _opts = driver_compiler_options(FLAGS.backbone, mesh)

    @partial(jax.jit, compiler_options=_opts)
    def feat_step(params, batch_stats, images):
        if images.dtype == jnp.uint8:
            images = device_prepare(images)
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(variables, images, train=False, method=model.features)

    from concurrent.futures import ThreadPoolExecutor

    from tennis_tpu.parallel.mesh import pad_batch

    def write_one(ds, feat, idx):
        path = ds.save_feature_path(int(idx))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, feat)

    for ds in datasets:
        split = ds._split
        loader = loaders[split]
        count = 0

        def padded():
            for batch in iter(loader):
                yield pad_batch(batch, loader.batch_size)

        # three-way overlap: batch t+1 transfers (prefetch thread) while batch
        # t computes and batch t-1's features fetch + write (.npy writes on a
        # small IO pool). The fetch of t-1 is deferred until t has dispatched,
        # so the device never idles on PCIe or disk.
        pending = None
        futures = []
        with ThreadPoolExecutor(4) as writer:

            def flush(item):
                nonlocal count
                feats_dev, idxs_dev, n = item
                # ONE transfer for features + indices; under --multihost each
                # host fetches and writes only its own stripe (fetch_local)
                feats, idxs = fetch_local((feats_dev, idxs_dev))
                feats = feats.astype(np.float32)[:n]
                for feat, idx in zip(feats, idxs[:n]):
                    futures.append(writer.submit(write_one, ds, feat, idx))
                count += int(n)
                # drain finished writes (surfacing errors) so the futures list
                # stays small over a multi-100K-frame dump
                while futures and futures[0].done():
                    futures.pop(0).result()

            for (images, labels, idxs), n in prefetch_to_device(
                    padded(), batch_sharding(mesh)):
                feats_dev = feat_step(state.params, state.batch_stats, images)
                if pending is not None:
                    flush(pending)
                pending = (feats_dev, idxs, n)
            if pending is not None:
                flush(pending)
            for f in futures:
                f.result()  # surface any write error
        logging.info("saved %d feature files for split %s", count, split)


def _load_backbone_from(state, from_id):
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    src_dir = experiment_dir("vision", from_id)
    latest = ckpt.latest_epoch(src_dir)
    if latest is None:
        logging.warning("no checkpoints in %s; backbone not transplanted", src_dir)
        return state
    logging.info("transplanting backbone from %s epoch %d", from_id, latest)
    donor = ckpt.load_state(ckpt.epoch_path(src_dir, latest), state)
    state.params["backbone"] = donor.params["backbone"]
    return state


def _pretrained_mounts(model):
    """Param-tree paths where a converted backbone table lands, per model family
    (reference train.py:199-214: backbone AND flow_net start pretrained; rdnet
    loads its own converted weights; sixc deliberately trains from scratch)."""
    from tennis_tpu.models import CNNRNN, TemporalPooling, TwoStreamModel

    if isinstance(model, TwoStreamModel):
        mounts = ["model_flow"]
        if model.model_rgb is not None:
            mounts.append("model_rgb")
        return mounts
    if isinstance(model, (CNNRNN, TemporalPooling)):
        return ["model/backbone"] if model.model is not None else []
    return ["backbone"]  # FrameModel, incl. the rdnet wrap


def _load_pretrained_backbone(state, model, npz_path):
    """Load converted pretrained weights from a flat .npz ('/'-joined param paths
    with batch_stats:: markers, as written by models/convert.py), re-rooted at
    every backbone mount the composed model has."""
    import jax

    from tennis_tpu.models.convert import inject_npz, rebase

    if FLAGS.flow == "sixc":
        raise ValueError(
            "--pretrained_npz is incompatible with --flow sixc: the 6-channel "
            "stem has no ImageNet counterpart and the reference trains sixc "
            "from scratch (reference train.py:202)"
        )
    mounts = _pretrained_mounts(model)
    if not mounts:
        raise ValueError(
            "--pretrained_npz needs a pixel backbone; this feats-mode model "
            "has none (features were extracted by an earlier experiment)"
        )
    flat = rebase(dict(np.load(npz_path)), mounts)
    # ONE batched device_get for both trees: per-leaf np.asarray would be a
    # tunnel round trip per parameter (see CLAUDE.md)
    params, stats = jax.device_get((state.params, state.batch_stats))
    params, stats, n = inject_npz(params, stats, flat)
    if n == 0:
        raise ValueError(
            f"no arrays from {npz_path} matched the model at mounts {mounts} "
            "— wrong --arch conversion for this --backbone?"
        )
    logging.info("loaded %d pretrained arrays from %s at %s", n, npz_path, mounts)
    return state.replace(params=params, batch_stats=stats)


def main(_argv):
    train_and_evaluate()


if __name__ == "__main__":
    app.run(main)
