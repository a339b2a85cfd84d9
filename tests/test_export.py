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
