"""HTTP serving driver: decode → coalesced static-batch inference → JSON."""
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


def test_serve_endpoint(tmp_path, monkeypatch):
    import cv2
    import jax
    import jax.numpy as jnp
    from http.server import ThreadingHTTPServer

    from tennis_tpu import serve as serve_mod
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.utils import checkpoint as ckpt

    monkeypatch.chdir(tmp_path)  # experiment dirs are cwd-relative

    # an experiment checkpoint without a training run: init + save + score
    model = FrameModel(get_backbone("resnet18_v2", dtype=jnp.bfloat16),
                       num_classes=11, dtype=jnp.bfloat16)
    tx, _ = sgd_with_schedule(0.001)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32),
                               tx, {"train": True})
    exp = os.path.join("models", "vision", "experiments", "s1")
    os.makedirs(exp)
    ckpt.save_state(ckpt.epoch_path(exp, 0), state)
    ckpt.append_score(exp, 0, 0.5)

    serve_mod.FLAGS.unparse_flags()
    serve_mod.FLAGS(["serve.py", "--model_id=s1", "--backbone=resnet18_v2",
                     "--data_shape=32", "--batch_size=4", "--max_wait_ms=30"])
    handler, batcher = serve_mod.build_service()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]

    rng = np.random.default_rng(0)
    ok, enc = cv2.imencode(".jpg", rng.integers(0, 255, (48, 64, 3))
                           .astype(np.uint8))
    assert ok
    data = enc.tobytes()

    def post():
        req = urllib.request.Request(url + "/predict", data=data,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    # concurrent posts exercise request coalescing into one device batch
    results = [None] * 3
    posters = [threading.Thread(target=lambda i=i: results.__setitem__(
        i, post())) for i in range(3)]
    for p in posters:
        p.start()
    for p in posters:
        p.join()
    for r in results:
        assert r["label"] in r["classes"]
        assert len(r["probs"]) == len(r["classes"]) == 11
        assert abs(sum(r["probs"]) - 1.0) < 1e-3
    # identical inputs → identical rows, batched or padded either way
    assert results[0]["probs"] == results[1]["probs"] == results[2]["probs"]

    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["requests"] == 3
    assert health["batches"] == batcher.batches >= 1

    # a non-image body is a clean 400, not a 500
    bad = urllib.request.Request(url + "/predict", data=b"not a jpeg",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad, timeout=60)
    assert e.value.code == 400

    # malformed / negative Content-Length headers are clean 400s too
    import http.client

    for bad_len in ("abc", "-5"):
        conn = http.client.HTTPConnection("127.0.0.1",
                                          httpd.server_address[1], timeout=60)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", bad_len)
        conn.endheaders()
        assert conn.getresponse().status == 400
        conn.close()

    httpd.shutdown()
    httpd.server_close()


def test_batcher_coalesces_and_pads():
    from tennis_tpu.serve import Batcher

    seen = []

    def fn(batch):
        seen.append(batch.shape[0])
        return batch[:, 0, 0, :].astype(np.float64)  # row-identifying output

    b = Batcher(fn, batch_size=4, max_wait_s=0.2)
    imgs = [np.full((2, 2, 3), i, np.uint8) for i in range(3)]
    out = [None] * 3
    ts = [threading.Thread(target=lambda i=i: out.__setitem__(
        i, b.submit(imgs[i]))) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    # every waiter got ITS row back, every run used the static batch shape
    for i in range(3):
        np.testing.assert_array_equal(out[i], np.full(3, i, np.float64))
    assert set(seen) == {4}
    assert b.rows == 3

    # device-side errors surface on the waiting request, not the dispatcher
    def boom(batch):
        raise RuntimeError("device on fire")

    eb = Batcher(boom, batch_size=2, max_wait_s=0.01)
    with pytest.raises(RuntimeError, match="device on fire"):
        eb.submit(imgs[0])


def test_batcher_stall_detection_and_timeout():
    import time

    from tennis_tpu.serve import Batcher

    entered = threading.Event()

    def slow(batch):
        entered.set()
        time.sleep(0.4)
        return batch[:, 0, 0, :].astype(np.float64)

    b = Batcher(slow, batch_size=1, max_wait_s=0.0)
    img = np.zeros((2, 2, 3), np.uint8)

    # a hung device call must show up as stalled while in flight…
    waiter = threading.Thread(target=lambda: b.submit(img))
    waiter.start()
    assert entered.wait(5)
    time.sleep(0.1)
    assert b.stalled(0.05)
    assert not b.stalled(10)
    waiter.join()
    # …and clear once the dispatcher is idle again
    assert not b.stalled(0.05)

    # submit() with a timeout answers instead of parking forever
    with pytest.raises(TimeoutError):
        Batcher(slow, batch_size=1, max_wait_s=0.0).submit(img, timeout=0.05)


def test_caption_endpoint(tmp_path, monkeypatch):
    """POST /caption: fixture-trained-shape captioner (init + saved
    valid_best), real feature sequence in, a decoded sentence out."""
    import io

    import jax
    import jax.numpy as jnp
    from http.server import ThreadingHTTPServer

    from tennis_tpu import serve as serve_mod
    from tennis_tpu.data import TennisSet
    from tennis_tpu.data.synthetic import build_fixture
    from tennis_tpu.data.tennis_set import get_feature_path
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.train_gnmt import FLAGS as GFLAGS, build_model
    from tennis_tpu.utils import checkpoint as ckpt

    monkeypatch.chdir(tmp_path)  # experiment dirs are cwd-relative
    root = build_fixture(str(tmp_path / "data"))

    # feature store for the features-path captioner (dim 32), covering every
    # fixture frame (source of truth: VIDEO_EVENTS, not a hardcoded table)
    from fixtures import VIDEO_EVENTS

    rng = np.random.default_rng(0)
    for video, events in VIDEO_EVENTS.items():
        for frame in range(events[-1][1]):
            path = get_feature_path(os.path.join(root, "features", "tf"),
                                    video, frame)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, rng.normal(size=(32,)).astype(np.float32))

    # vision checkpoint for the /predict side (build_service always mounts it)
    model = FrameModel(get_backbone("resnet18_v2", dtype=jnp.bfloat16),
                       num_classes=11, dtype=jnp.bfloat16)
    tx, _ = sgd_with_schedule(0.001)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.float32),
                               tx, {"train": True})
    exp_v = os.path.join("models", "vision", "experiments", "s2")
    os.makedirs(exp_v)
    ckpt.save_state(ckpt.epoch_path(exp_v, 0), state)
    ckpt.append_score(exp_v, 0, 0.5)

    # captioning checkpoint: init with the SAME arch flags serving will get
    gnmt_argv = ["--feats_model=tf", "--num_hidden=16", "--emb_size=8",
                 "--tgt_max_len=10", "--emb_file="]
    GFLAGS.unparse_flags()
    GFLAGS(["t", f"--root={root}", "--model_id=c1", *gnmt_argv])
    vocab = TennisSet(root=root, captions=True, split="train",
                      feats_model="tf", max_cap_len=10).vocab
    cap_model = build_model(len(vocab))
    variables = jax.jit(cap_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 32), jnp.float32),
        jnp.zeros((1, 2), jnp.int32))
    exp_c = os.path.join("models", "captioning", "experiments", "c1")
    os.makedirs(exp_c)
    ckpt.save_state(os.path.join(exp_c, "valid_best.params"),
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})})

    serve_mod.FLAGS.unparse_flags()
    serve_mod.FLAGS([
        "serve.py", "--model_id=s2", "--backbone=resnet18_v2",
        "--data_shape=32", "--batch_size=2", "--max_wait_ms=30",
        f"--root={root}", "--caption_model_id=c1", "--src_max_len=16",
        "--caption_batch_size=2",
    ] + [f"--gnmt_flag={a}" for a in gnmt_argv])
    handler, _batcher = serve_mod.build_service()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = "http://127.0.0.1:%d" % httpd.server_address[1]

    feats = np.random.default_rng(2).normal(size=(10, 32)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, feats)

    def post(body):
        req = urllib.request.Request(url + "/caption", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    # two concurrent requests coalesce into one beam batch
    results = [None] * 2
    posters = [threading.Thread(target=lambda i=i: results.__setitem__(
        i, post(buf.getvalue()))) for i in range(2)]
    for p in posters:
        p.start()
    for p in posters:
        p.join()
    for r in results:
        assert isinstance(r["caption"], str)
        assert r["frames_used"] == 10
        assert all(tok in vocab.token_to_idx for tok in r["tokens"])
        assert r["caption"] == " ".join(r["tokens"])
    assert results[0] == results[1]  # identical inputs, identical decode

    # a sequence longer than src_max_len is truncated, not rejected
    long_feats = np.random.default_rng(3).normal(size=(40, 32)) \
        .astype(np.float32)
    buf2 = io.BytesIO()
    np.save(buf2, long_feats)
    assert post(buf2.getvalue())["frames_used"] == 16

    # wrong feature dim, non-npy, and non-numeric-dtype bodies are clean 400s
    # (a (T, D) unicode array loads fine under allow_pickle=False but would
    # raise out of the float32 copy — must 400, not drop the connection)
    bad_dim = io.BytesIO()
    np.save(bad_dim, np.zeros((5, 7), np.float32))
    bad_dtype = io.BytesIO()
    np.save(bad_dtype, np.full((5, 32), "a", dtype="<U1"))
    bad_td = io.BytesIO()  # timedelta64 subclasses integer — still not real
    np.save(bad_td, np.zeros((5, 32), dtype="timedelta64[s]"))
    for body in (bad_dim.getvalue(), b"definitely not npy",
                 bad_dtype.getvalue(), bad_td.getvalue()):
        req = urllib.request.Request(url + "/caption", data=body,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400

    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["caption_requests"] == 3
    assert health["caption_batches"] >= 2

    httpd.shutdown()
    httpd.server_close()
