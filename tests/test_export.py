"""AOT export (tennis_tpu.export): freeze → serialize → reload → score,
and equality against the live inference scorer the artifact replaces."""
import os

import numpy as np
import pytest

from fixtures import build_fixture

BACKBONE = "resnet18_v2"
SHAPE = 32
BATCH = 2


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """A fixture dataset + a fabricated trained experiment + its export."""
    import jax
    import jax.numpy as jnp

    base = tmp_path_factory.mktemp("exp")
    root = build_fixture(base / "ds")
    cwd = os.getcwd()
    os.chdir(base)
    try:
        from tennis_tpu.data.tennis_set import load_classes
        from tennis_tpu.models import FrameModel, get_backbone
        from tennis_tpu.parallel import create_train_state, sgd_with_schedule
        from tennis_tpu.utils import checkpoint as ckpt
        from tennis_tpu.utils.experiments import experiment_dir

        classes = load_classes(root)
        model = FrameModel(get_backbone(BACKBONE, dtype=jnp.bfloat16),
                           num_classes=len(classes), dtype=jnp.bfloat16)
        tx, _ = sgd_with_schedule(0.001)
        state = create_train_state(
            model, jax.random.PRNGKey(3),
            jnp.zeros((1, SHAPE, SHAPE, 3), jnp.float32), tx, {"train": True})
        exp_dir = experiment_dir("vision", "t9")
        ckpt.save_state(ckpt.epoch_path(exp_dir, 0), state)
        ckpt.append_score(exp_dir, 0, 0.5)

        from tennis_tpu.export import export_classifier, save_exported

        blob, meta = export_classifier(BACKBONE, "t9", SHAPE, BATCH, root=root)
        out = str(base / "t9.hlo")
        save_exported(out, blob, meta)
        yield {"base": base, "root": root, "out": out, "meta": meta}
    finally:
        os.chdir(cwd)


def test_artifact_files_and_meta(exported):
    meta = exported["meta"]
    assert os.path.exists(exported["out"])
    assert os.path.exists(exported["out"] + ".json")
    assert meta["kind"] == "vision-classifier"
    assert meta["input"] == {"shape": [BATCH, SHAPE, SHAPE, 3],
                             "dtype": "uint8"}
    assert meta["output"]["shape"] == [BATCH, len(meta["classes"])]
    assert meta["epoch"] == 0 and meta["platforms"]


def test_reload_matches_live_scorer(exported):
    """The exported program must reproduce the live jitted scorer to bf16
    tolerance — same traced computation, but two separate XLA compiles (the
    live path adds driver compiler options) may fuse differently."""
    from tennis_tpu.export import load_exported

    classes, predict, meta = load_exported(exported["out"])
    rng = np.random.default_rng(11)
    images = rng.integers(0, 255, size=(BATCH, SHAPE, SHAPE, 3),
                          dtype=np.uint8)
    probs = predict(images)
    assert probs.shape == (BATCH, len(classes))
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-3)

    cwd = os.getcwd()
    os.chdir(exported["base"])
    try:
        from tennis_tpu.inference import load_classifier

        live_classes, live_predict, _ = load_classifier(
            BACKBONE, "t9", SHAPE, root=exported["root"])
    finally:
        os.chdir(cwd)
    assert live_classes == classes
    np.testing.assert_allclose(probs, live_predict(images), atol=2e-3)


def test_static_shape_guard(exported):
    from tennis_tpu.export import load_exported

    _, predict, _ = load_exported(exported["out"])
    with pytest.raises(ValueError, match="shape-static"):
        predict(np.zeros((BATCH + 1, SHAPE, SHAPE, 3), np.uint8))
    with pytest.raises(ValueError, match="shape-static"):
        predict(np.zeros((BATCH, SHAPE, SHAPE, 3), np.float32))


def test_format_version_guard(exported, tmp_path):
    import json
    import shutil

    from tennis_tpu.export import load_exported

    bad = str(tmp_path / "bad.hlo")
    shutil.copyfile(exported["out"], bad)
    meta = json.load(open(exported["out"] + ".json"))
    meta["format_version"] = 999
    json.dump(meta, open(bad + ".json", "w"))
    with pytest.raises(ValueError, match="unsupported export format"):
        load_exported(bad)


def test_serve_from_export(exported):
    """serve.py --from_export boots the HTTP endpoint from the frozen artifact
    alone — no experiment dir, no model code — and the sidecar's static batch
    geometry (BATCH=2 here, not the flag default 8) drives the coalescer."""
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    from tennis_tpu import serve as serve_mod

    serve_mod.FLAGS.unparse_flags()
    serve_mod.FLAGS(["serve.py", f"--from_export={exported['out']}",
                     "--max_wait_ms=30"])
    handler, batcher = serve_mod.build_service()
    assert batcher._batch == BATCH  # sidecar overrides the flag default (8)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        rng = np.random.default_rng(5)
        ok, enc = cv2.imencode(
            ".jpg", rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
        assert ok
        req = urllib.request.Request(url + "/predict", data=enc.tobytes(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _json.loads(r.read())
        assert out["label"] in out["classes"]
        assert len(out["probs"]) == len(out["classes"])
        assert abs(sum(out["probs"]) - 1.0) < 1e-3
    finally:
        httpd.shutdown()
        httpd.server_close()


GNMT_ARGV = ["--feats_model=tf", "--num_hidden=16", "--emb_size=8",
             "--tgt_max_len=10", "--emb_file="]


@pytest.fixture(scope="module")
def exported_cap(tmp_path_factory):
    """A fixture dataset + fabricated captioning experiment + its beam-decode
    export (kind='captioner')."""
    import jax
    import jax.numpy as jnp

    base = tmp_path_factory.mktemp("expcap")
    root = build_fixture(str(base / "ds"))
    cwd = os.getcwd()
    os.chdir(base)
    try:
        from tennis_tpu.data import TennisSet
        from tennis_tpu.data.tennis_set import get_feature_path
        from tennis_tpu.train_gnmt import FLAGS as GFLAGS, build_model
        from tennis_tpu.utils import checkpoint as ckpt

        from fixtures import VIDEO_EVENTS

        # cover every fixture frame (source of truth: VIDEO_EVENTS — a
        # hardcoded (video, n) table went stale when the fixture grew)
        rng = np.random.default_rng(0)
        for video, events in VIDEO_EVENTS.items():
            for frame in range(events[-1][1]):
                p = get_feature_path(os.path.join(root, "features", "tf"),
                                     video, frame)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                np.save(p, rng.normal(size=(32,)).astype(np.float32))

        GFLAGS.unparse_flags()
        GFLAGS(["t", f"--root={root}", "--model_id=c9", *GNMT_ARGV])
        vocab = TennisSet(root=root, captions=True, split="train",
                          feats_model="tf", max_cap_len=10).vocab
        cap_model = build_model(len(vocab))
        variables = jax.jit(cap_model.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, 16, 32), jnp.float32),
            jnp.zeros((1, 2), jnp.int32))
        exp_c = os.path.join("models", "captioning", "experiments", "c9")
        os.makedirs(exp_c)
        ckpt.save_state(os.path.join(exp_c, "valid_best.params"),
                        {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})})

        from tennis_tpu.export import export_captioner, save_exported

        blob, meta = export_captioner("c9", batch_size=2, src_max_len=16,
                                      root=root, gnmt_argv=GNMT_ARGV)
        out = str(base / "c9.hlo")
        save_exported(out, blob, meta)
        yield {"base": base, "root": root, "out": out, "meta": meta,
               "vocab": vocab}
    finally:
        os.chdir(cwd)


def test_captioner_meta_and_reload_matches_live(exported_cap):
    """The frozen beam program must decode token-for-token identically to the
    live load_captioner path on the same inputs."""
    from tennis_tpu.export import load_exported_captioner

    meta = exported_cap["meta"]
    vocab = exported_cap["vocab"]
    assert meta["kind"] == "captioner"
    assert meta["idx_to_token"] == list(vocab.idx_to_token)
    assert meta["input"] == {"shape": [2, 16, 32], "dtype": "float32"}
    assert meta["beam_size"] == 4  # train_gnmt flag surface default

    toks, caption_batch, _ = load_exported_captioner(exported_cap["out"])
    assert toks == list(vocab.idx_to_token)
    rng = np.random.default_rng(7)
    feats = rng.normal(size=(2, 16, 32)).astype(np.float32)
    lengths = np.array([10, 16], np.int32)
    captions = caption_batch(feats, lengths)
    assert len(captions) == 2
    assert all(t in vocab.token_to_idx for cap in captions for t in cap)

    cwd = os.getcwd()
    os.chdir(exported_cap["base"])
    try:
        from tennis_tpu.inference import load_captioner

        _v, live_fn, _info = load_captioner(
            "c9", root=exported_cap["root"], gnmt_argv=GNMT_ARGV,
            src_max_len=16)
        live = live_fn(feats, lengths)
    finally:
        os.chdir(cwd)
    assert [list(c) for c in captions] == [list(c) for c in live]


def test_captioner_loader_kind_guard(exported, exported_cap):
    """Cross-kind loads fail loudly, not with a shape error deep in XLA."""
    from tennis_tpu.export import load_exported, load_exported_captioner

    with pytest.raises(ValueError, match="artifact kind"):
        load_exported_captioner(exported["out"])
    with pytest.raises(ValueError, match="artifact kind"):
        load_exported(exported_cap["out"])

    _, caption_batch, _ = load_exported_captioner(exported_cap["out"])
    with pytest.raises(ValueError, match="shape-static"):
        caption_batch(np.zeros((3, 16, 32), np.float32),
                      np.ones((3,), np.int32))


def test_serve_from_caption_export(exported, exported_cap):
    """serve.py boots BOTH endpoints from frozen artifacts alone."""
    import io
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from tennis_tpu import serve as serve_mod

    serve_mod.FLAGS.unparse_flags()
    serve_mod.FLAGS(["serve.py", f"--from_export={exported['out']}",
                     f"--caption_from_export={exported_cap['out']}",
                     "--max_wait_ms=30"])
    handler, _ = serve_mod.build_service()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        feats = np.random.default_rng(3).normal(size=(9, 32)) \
            .astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, feats)
        req = urllib.request.Request(url + "/caption", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert out["frames_used"] == 9
        assert out["caption"] == " ".join(out["tokens"])
        toks = exported_cap["meta"]["idx_to_token"]
        assert all(t in toks for t in out["tokens"])
    finally:
        httpd.shutdown()
        httpd.server_close()
