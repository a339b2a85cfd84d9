"""End-to-end smoke of the CLI drivers on the synthetic fixture (tiny configs)."""
import os

import numpy as np
import pytest

from fixtures import build_fixture


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("exp")
    root = build_fixture(tmp_path_factory.mktemp("ds"), with_flow=True)
    old = os.getcwd()
    os.chdir(workdir)  # experiment dirs are cwd-relative
    yield str(root), str(workdir)
    os.chdir(old)


def test_train_evaluate_vision_cycle(env):
    import sys

    root, workdir = env
    from absl import app

    from tennis_tpu import train as train_driver

    argv_train = [
        "train.py", f"--root={root}", "--model_id=t1", "--backbone=resnet18_v2",
        "--data_shape=32", "--batch_size=8", "--epochs=1", "--log_interval=10",
        "--num_workers=2",
    ]
    try:
        app.run(train_driver.main, argv=argv_train)
    except SystemExit:
        pass
    exp = os.path.join(workdir, "models", "vision", "experiments", "t1")
    assert os.path.exists(os.path.join(exp, "0000.params"))
    assert os.path.exists(os.path.join(exp, "scores.txt"))

    # save features from the trained model, then a CNNRNN run on them
    argv_feats = argv_train[:-1] + ["--save_feats"]
    try:
        app.run(train_driver.main, argv=argv_feats)
    except SystemExit:
        pass
    feats = [
        f for _, _, files in os.walk(os.path.join(root, "features", "t1"))
        for f in files if f.endswith(".npy")
    ]
    # EVERY frame must be dumped (the ±255 save_feats extension covers the
    # whole fixture): the train split must not lose its ragged last batch to
    # the SGD loader's drop_last (reference train.py:187-188 keeps it)
    n_frames = sum(
        1 for _, _, files in os.walk(os.path.join(root, "frames"))
        for f in files if f.endswith(".jpg")
    )
    assert len(feats) == n_frames, (len(feats), n_frames)


def test_train_temp_pool_final_test(env):
    """--temp_pool max|mean through train.py runs NO training: it is the
    final-test wrap of the framewise-trained donor — pooled backbone features
    through the donor's own head (reference train.py:326-350, the 0028-row
    workflow). Depends on the t1 experiment + features from the cycle test."""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import train as train_driver

    flags.FLAGS.unparse_flags()
    argv = [
        "train.py", f"--root={root}", "--model_id=tp1", "--backbone=resnet18_v2",
        "--data_shape=32", "--batch_size=8", "--temp_pool=mean", "--window=4",
        "--feats_model=t1", "--num_workers=2",
    ]
    out = {}
    def run(_argv):
        out["metrics"] = train_driver.train_and_evaluate()
    try:
        app.run(run, argv=argv)
    except SystemExit:
        pass
    prf1 = out["metrics"]["prf1"].get_dict()
    assert 0.0 <= prf1["AVG_NB_f1"] <= 1.0
    # no training happened: the tp1 experiment dir has no checkpoints
    exp = os.path.join(workdir, "models", "vision", "experiments", "tp1")
    assert not [f for f in os.listdir(exp) if f.endswith(".params")]


def test_evaluate_temp_pool_wrap(env):
    """evaluate.py --temp_pool mean: donor checkpoint (--feats_model exp),
    features pooled over the window through the donor's own head (reference
    evaluate.py:224-244). Depends on the t1 experiment + features."""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import evaluate as evaluate_driver

    flags.FLAGS.unparse_flags()
    argv = [
        "evaluate.py", f"--root={root}", "--model_id=tp2",
        "--backbone=resnet18_v2", "--data_shape=32", "--batch_size=8",
        "--temp_pool=mean", "--window=4", "--feats_model=t1",
        "--num_workers=2",
    ]
    results = {}
    def run(_argv):
        r, g, m = evaluate_driver.evaluate_model()
        results.update(r=r, g=g, m=m)
    try:
        app.run(run, argv=argv)
    except SystemExit:
        pass
    assert len(results["r"]) > 0
    prf1 = results["m"]["prf1"].get_dict()
    assert 0.0 <= prf1["AVG_NB_f1"] <= 1.0


def test_evaluate_vision_driver(env):
    """evaluate.py: best-epoch load, metric suite, results dict, --vis overlay
    (reference evaluate.py:78-270). Depends on the t1 experiment trained above."""
    import os

    root, workdir = env
    from absl import app, flags

    from tennis_tpu import evaluate as evaluate_driver

    metrics_out = os.path.join(workdir, "metrics_t1.json")
    flags.FLAGS.unparse_flags()
    argv = [
        "evaluate.py", f"--root={root}", "--model_id=t1",
        "--backbone=resnet18_v2", "--data_shape=32", "--batch_size=8",
        "--num_workers=2", "--vis", f"--metrics_out={metrics_out}",
    ]
    results = {}
    def run(_argv):
        r, g, m = evaluate_driver.evaluate_model()
        results.update(r=r, g=g, m=m)
    try:
        app.run(run, argv=argv)
    except SystemExit:
        pass
    assert len(results["r"]) > 0 and len(results["r"]) == len(results["g"])
    probs = next(iter(results["r"].values()))
    assert probs.shape == (11,) and abs(float(probs.sum()) - 1.0) < 1e-3
    exp = os.path.join(workdir, "models", "vision", "experiments", "t1")
    assert os.path.exists(os.path.join(exp, "results.mp4"))

    # --metrics_out schema+scale contract (the load-bearing surface between
    # the drivers and tennis_tpu.parity): full PRF1 name set, FRACTIONS in
    # [0, 1] — gate_vision multiplies by 100, so a percent-scale writer here
    # would silently destroy every parity verdict
    import json

    from fixtures import CLASSES

    dumped = json.load(open(metrics_out))
    expect = {f"{c}_{s}" for c in CLASSES for s in ("prec", "rec", "f1")}
    expect |= {f"AVG_{s}" for s in ("prec", "rec", "f1")}
    expect |= {f"AVG_NB_{s}" for s in ("prec", "rec", "f1")}
    assert set(dumped) == expect
    assert all(0.0 <= v <= 1.0 for v in dumped.values()), dumped
    assert dumped == results["m"]["prf1"].get_dict()

    # --split val evaluates the validation split with test-time settings
    # (reference evaluate.py:40-41,107)
    flags.FLAGS.unparse_flags()
    argv_val = [
        "evaluate.py", f"--root={root}", "--model_id=t1",
        "--backbone=resnet18_v2", "--data_shape=32", "--batch_size=8",
        "--num_workers=2", "--split=val",
    ]
    val_results = {}
    def run_val(_argv):
        r, g, m = evaluate_driver.evaluate_model()
        val_results.update(r=r, g=g, m=m)
    try:
        app.run(run_val, argv=argv_val)
    except SystemExit:
        pass
    assert len(val_results["r"]) > 0
    # a different split evaluates different frames
    assert set(val_results["r"]) != set(results["r"])


def test_evaluate_save_feats_dumps_split_only(env):
    """evaluate.py --save_feats dumps ONLY the --split dataset (reference
    evaluate.py:209-211 zips the single test_data/test_set pair), unlike
    train.py --save_feats which dumps all three. Depends on the t1 experiment
    + features from the cycle test: the val-split files are deleted and must
    be restored. (On this fixture the ±255 save_feats extension makes every
    split's dump cover whole videos, so "val only" is asserted on the dataset
    list handed to save_features, not on file sets.)"""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import evaluate as evaluate_driver
    from tennis_tpu import train as train_driver
    from tennis_tpu.data import TennisSet

    val_set = TennisSet(root=root, split="val", split_id="02", balance=False,
                        model_id="t1", save_feats=True)
    val_paths = {val_set.save_feature_path(i) for i in range(len(val_set))}
    assert val_paths, "fixture val split is empty"
    for p in val_paths:
        if os.path.exists(p):
            os.remove(p)

    dumped_splits = []
    real_save_features = train_driver.save_features

    def spy(model, state, datasets, loaders, mesh):
        dumped_splits.extend(ds._split for ds in datasets)
        return real_save_features(model, state, datasets, loaders, mesh)

    flags.FLAGS.unparse_flags()
    argv = [
        "evaluate.py", f"--root={root}", "--model_id=t1",
        "--backbone=resnet18_v2", "--data_shape=32", "--batch_size=8",
        "--num_workers=2", "--split=val", "--save_feats",
    ]
    train_driver.save_features = spy
    try:
        app.run(evaluate_driver.main, argv=argv)
    except SystemExit:
        pass
    finally:
        train_driver.save_features = real_save_features

    assert dumped_splits == ["val"]
    missing = [p for p in val_paths if not os.path.exists(p)]
    assert not missing, f"val features not restored: {missing[:3]}"


def _make_feature_store(root, name, dim=32):
    """Tiny .npy feature store covering every on-disk fixture frame."""
    from tennis_tpu.data.tennis_set import get_feature_path

    from fixtures import VIDEO_EVENTS

    rng = np.random.default_rng(0)
    for video, events in VIDEO_EVENTS.items():
        for frame in range(events[-1][1]):
            path = get_feature_path(os.path.join(root, "features", name),
                                    video, frame)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, rng.normal(size=(dim,)).astype(np.float32))


def test_train_gnmt_cycle(env):
    root, workdir = env
    from tennis_tpu.train_gnmt import main as gnmt_main

    _make_feature_store(root, "tf")
    gnmt_main([
        "train_gnmt.py", f"--root={root}", "--model_id=g1", "--feats_model=tf",
        "--epochs=1", "--batch_size=4", "--test_batch_size=4", "--num_hidden=16",
        "--emb_size=8", "--num_buckets=2", "--tgt_max_len=10", "--emb_file=",
        "--log_interval=10",
    ])
    exp = os.path.join(workdir, "models", "captioning", "experiments", "g1")
    assert os.path.exists(os.path.join(exp, "valid_best.params"))
    assert os.path.exists(os.path.join(exp, "val_gt.txt"))
    assert os.path.exists(os.path.join(exp, "best_test_out.txt"))

    from tennis_tpu.evaluate_gnmt import main as eval_main

    metrics_out = os.path.join(workdir, "metrics_g1.json")
    suite = eval_main([
        "evaluate_gnmt.py", f"--root={root}", "--model_id=g1", "--feats_model=tf",
        "--num_hidden=16", "--emb_size=8", "--num_buckets=2", "--tgt_max_len=10",
        "--test_batch_size=4", "--emb_file=", f"--metrics_out={metrics_out}",
    ])
    assert set(suite) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                          "ROUGE_L", "CIDEr"}

    # --metrics_out schema+scale contract: the RAW nlg_metric_suite dict —
    # Bleu/METEOR/ROUGE_L fractions in [0, 1], CIDEr on the pycocoevalcap
    # scale (0-10). gate_captioning multiplies by 100 (PARITY round-4 bug:
    # a percent-scale writer here fails a perfect-parity real-data run).
    import json

    dumped = json.load(open(metrics_out))
    assert set(dumped) == set(suite)
    for k, v in dumped.items():
        hi = 10.0 if k == "CIDEr" else 1.0
        assert 0.0 <= v <= hi, (k, v)
    assert dumped == pytest.approx(suite)

    # --num_devices 4: the sharded beam decode (ragged tails padded over the
    # virtual mesh) must reproduce the single-device predictions exactly
    single = open(os.path.join(exp, "best_test_out.txt")).read()
    suite4 = eval_main([
        "evaluate_gnmt.py", f"--root={root}", "--model_id=g1", "--feats_model=tf",
        "--num_hidden=16", "--emb_size=8", "--num_buckets=2", "--tgt_max_len=10",
        "--test_batch_size=4", "--emb_file=", "--num_devices=4", "--force",
    ])
    assert open(os.path.join(exp, "best_test_out.txt")).read() == single
    assert suite4 == suite


def test_train_gnmt_resume_keeps_decay_chain(env):
    """A resume inside the LR-decay zone must keep compounding from the
    restored LR (reference compounds off trainer.learning_rate,
    train_gnmt.py:456-459), not restart the ×factor chain from FLAGS.lr."""
    root, workdir = env
    import math

    from tennis_tpu.train_gnmt import main as gnmt_main

    _make_feature_store(root, "tf")
    args = [
        "train_gnmt.py", f"--root={root}", "--model_id=gres", "--feats_model=tf",
        "--epochs=4", "--batch_size=4", "--test_batch_size=4", "--num_hidden=16",
        "--emb_size=8", "--num_buckets=1", "--tgt_max_len=10", "--emb_file=",
        "--log_interval=10", "--max_batches=1", "--lr=0.01",
        "--lr_update_factor=0.5",
    ]
    gnmt_main(args)
    exp = os.path.join(workdir, "models", "captioning", "experiments", "gres")
    # decay zone: epoch+1 >= (4*2)//3=2 → decays at epochs 1,2,3
    # simulate a crash after epoch 1: drop the later checkpoints and the log
    os.remove(os.path.join(exp, "0002.params"))
    os.remove(os.path.join(exp, "0003.params"))
    os.remove(os.path.join(exp, "log.txt"))
    gnmt_main(args)

    log = open(os.path.join(exp, "log.txt")).read()
    assert "resumed from epoch 1" in log
    decays = [float(line.rsplit(" ", 1)[1]) for line in log.splitlines()
              if "lr decayed to" in line]
    # resumed at epoch 2 with the restored lr 0.005: the remaining decays are
    # 0.0025 and 0.00125 (a chain restarted from FLAGS.lr would log 0.005 first)
    assert len(decays) == 2, decays
    assert math.isclose(decays[0], 0.0025, rel_tol=1e-5), decays
    assert math.isclose(decays[1], 0.00125, rel_tol=1e-5), decays


def test_train_gnmt_num_devices(env):
    """train_gnmt --num_devices 8: bucketed batches shard over the virtual
    8-device data mesh (beats the reference's single-GPU limit,
    train_gnmt.py:126-129). Depends on the tf feature store from the cycle test."""
    root, workdir = env
    from tennis_tpu.train_gnmt import main as gnmt_main

    # 4 devices / batch 4: the fixture has 4 train captions, and the sampler
    # trims batches to multiples of num_devices
    gnmt_main([
        "train_gnmt.py", f"--root={root}", "--model_id=g3", "--feats_model=tf",
        "--num_devices=4", "--epochs=3", "--batch_size=4", "--test_batch_size=4",
        "--num_hidden=16", "--emb_size=8", "--num_buckets=1", "--tgt_max_len=10",
        "--emb_file=", "--log_interval=10", "--max_batches=2",
    ])
    exp = os.path.join(workdir, "models", "captioning", "experiments", "g3")
    assert os.path.exists(os.path.join(exp, "valid_best.params"))
    log = open(os.path.join(exp, "log.txt")).read()
    assert "loss=" in log  # finite losses logged from the sharded step


def test_train_gnmt_pixels_path(env):
    """Pixels-path captioner: backbone transplant + freeze + on-device augment
    (reference train_gnmt.py:149-180)."""
    root, workdir = env
    import jax
    import jax.numpy as jnp

    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.utils import checkpoint as ckpt
    from tennis_tpu.utils.experiments import experiment_dir

    # synthetic donor vision experiment (one saved epoch)
    model = FrameModel(get_backbone("resnet18_v2", dtype=jnp.float32),
                       num_classes=11, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.01)
    donor = create_train_state(model, jax.random.PRNGKey(3),
                               jnp.zeros((1, 32, 32, 3)), tx, {"train": True})
    exp = experiment_dir("vision", "t2")
    ckpt.save_state(ckpt.epoch_path(exp, 0), donor)

    from tennis_tpu.train_gnmt import main as gnmt_main

    params = gnmt_main([
        "train_gnmt.py", f"--root={root}", "--model_id=g2",
        "--backbone=resnet18_v2", "--backbone_from_id=t2", "--freeze_backbone",
        "--data_shape=32", "--epochs=1", "--batch_size=2",
        "--test_batch_size=2", "--num_hidden=16", "--emb_size=8",
        "--num_buckets=1", "--tgt_max_len=10", "--emb_file=", "--every=10",
        "--max_batches=2", "--log_interval=1",
    ])
    # frozen backbone: src_embed must still equal the transplanted donor weights
    donor_leaves = jax.tree_util.tree_leaves(
        jax.device_get(donor.params["backbone"]))
    got_leaves = jax.tree_util.tree_leaves(jax.device_get(params["src_embed"]))
    assert len(donor_leaves) == len(got_leaves)
    assert all(np.allclose(a, b) for a, b in zip(donor_leaves, got_leaves))


def test_train_two_stream_driver(env):
    """--flow twos: 6-channel RGB+flow input through TwoStreamModel — the
    0010-row driver path (reference train.py:200-208)."""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import train as train_driver

    flags.FLAGS.unparse_flags()
    argv = [
        "train.py", f"--root={root}", "--model_id=ts1",
        "--backbone=resnet18_v2", "--flow=twos", "--data_shape=32",
        "--batch_size=8", "--epochs=1", "--max_batches=2",
        "--log_interval=5", "--num_workers=2",
    ]
    try:
        app.run(train_driver.main, argv=argv)
    except SystemExit:
        pass
    exp = os.path.join(workdir, "models", "vision", "experiments", "ts1")
    assert os.path.exists(os.path.join(exp, "0000.params"))
    assert os.path.exists(os.path.join(exp, "scores.txt"))


def test_train_rdnet_driver(env):
    """--backbone rdnet --window 8: R(2+1)D-34 clips through the driver — the
    0031-row path (reference train.py:236-241; window must be 8 or 32)."""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import train as train_driver

    flags.FLAGS.unparse_flags()
    argv = [
        # single-device mesh: SPMD-partitioning the 3D convs over the 8
        # virtual CPU devices dominates compile time at these tiny shapes
        "train.py", f"--root={root}", "--model_id=rd1", "--backbone=rdnet",
        "--window=8", "--data_shape=32", "--batch_size=4", "--epochs=1",
        "--max_batches=2", "--log_interval=5", "--num_workers=2",
        "--num_devices=1",
    ]
    try:
        app.run(train_driver.main, argv=argv)
    except SystemExit:
        pass
    exp = os.path.join(workdir, "models", "vision", "experiments", "rd1")
    assert os.path.exists(os.path.join(exp, "0000.params"))
    assert os.path.exists(os.path.join(exp, "scores.txt"))


def test_train_cnnrnn_on_features_driver(env):
    """Train CNN-RNN on dumped features through train.py — the 0042-row config
    (reference train.py:210-215 feats path). Regression: the stat-less model's
    empty batch_stats must stay type-stable across steps (flax returns the
    absent collection as a plain dict, which used to break the sharding prefix
    match on step 2). Depends on the t1 feature dump from the cycle test."""
    root, workdir = env
    from absl import app, flags

    from tennis_tpu import train as train_driver

    flags.FLAGS.unparse_flags()
    argv = [
        "train.py", f"--root={root}", "--model_id=cr1",
        "--backbone=resnet18_v2", "--feats_model=t1", "--temp_pool=gru",
        "--window=4", "--data_shape=32", "--batch_size=8", "--epochs=1",
        "--max_batches=3", "--log_interval=5", "--num_workers=2",
    ]
    try:
        app.run(train_driver.main, argv=argv)
    except SystemExit:
        pass
    exp = os.path.join(workdir, "models", "vision", "experiments", "cr1")
    assert os.path.exists(os.path.join(exp, "0000.params"))
    assert os.path.exists(os.path.join(exp, "scores.txt"))


def test_predict_video_driver(env):
    """predict.py (beyond-parity): raw mp4 → streamed batched inference →
    probabilities + events timeline + overlay, with no dataset scaffolding.
    Depends on the t1 experiment trained by the cycle test."""
    root, workdir = env
    from tennis_tpu.data.video import frames_to_video
    from tennis_tpu.predict import label_runs, main as predict_main

    video_dir = next(
        os.path.join(root, "frames", d)
        for d in sorted(os.listdir(os.path.join(root, "frames")))
    )
    mp4 = frames_to_video(video_dir, os.path.join(workdir, "clip.mp4"), fps=10)
    assert mp4 is not None

    out_dir = os.path.join(workdir, "pred_out")
    probs, frame_ids, events = predict_main([
        "predict.py", f"--video={mp4}", f"--root={root}", "--model_id=t1",
        "--backbone=resnet18_v2", "--data_shape=32", "--batch_size=8",
        "--every=2", f"--out_dir={out_dir}", "--vis",
    ])
    n_frames = len([f for _, _, fs in os.walk(video_dir) for f in fs])
    assert len(probs) == -(-n_frames // 2)  # every 2nd frame
    assert probs.shape[1] == 11
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-3)
    assert list(frame_ids) == sorted(frame_ids)
    # artifacts
    assert os.path.exists(os.path.join(out_dir, "probabilities.npy"))
    assert os.path.exists(os.path.join(out_dir, "results.mp4"))
    lines = open(os.path.join(out_dir, "events.tsv")).read().strip().split("\n")
    assert lines[0] == "start\tend\tclass\tmean_prob"
    assert len(lines) - 1 == len(events)
    # events tile the sampled range contiguously
    assert events[0][0] == frame_ids[0] and events[-1][1] == frame_ids[-1]

    # label_runs unit semantics
    runs = label_runs(np.array([1, 1, 2, 2, 2, 1]),
                      np.array([0, 2, 4, 6, 8, 10]),
                      np.eye(3)[[1, 1, 2, 2, 2, 1]])
    assert runs == [(0, 2, 1, 1.0), (4, 8, 2, 1.0), (10, 10, 1, 1.0)]
