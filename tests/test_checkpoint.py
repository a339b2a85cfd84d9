import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.utils import checkpoint as ckpt


def _state():
    return {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "step": jnp.asarray(7),
    }


def test_save_load_roundtrip(tmp_path):
    path = ckpt.epoch_path(str(tmp_path), 3)
    state = _state()
    ckpt.save_state(path, state)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt.load_state(path, zero)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7


def test_epoch_naming_and_resume(tmp_path):
    d = str(tmp_path)
    assert ckpt.resume_epoch(d) == 0
    for e in (0, 1, 5):
        ckpt.save_state(ckpt.epoch_path(d, e), _state())
    assert os.path.exists(os.path.join(d, "0005.params"))
    assert ckpt.list_epochs(d) == [0, 1, 5]
    assert ckpt.latest_epoch(d) == 5
    assert ckpt.resume_epoch(d) == 6
    # valid_best.params must not confuse the scan (reference train_gnmt.py:241-245)
    ckpt.save_state(os.path.join(d, "valid_best.params"), _state())
    assert ckpt.latest_epoch(d) == 5


def test_scores_and_best_epoch(tmp_path):
    d = str(tmp_path)
    assert ckpt.best_epoch(d) is None
    for e, s in [(0, 0.1), (1, 0.5), (2, 0.3)]:
        ckpt.append_score(d, e, s)
        ckpt.save_state(ckpt.epoch_path(d, e), _state())
    assert ckpt.best_epoch(d) == (1, 0.5)
    assert ckpt.best_or_latest(d) == (1, 0.5)
    with open(os.path.join(d, "scores.txt")) as f:
        lines = f.read().splitlines()
    assert lines[0] == "0\t0.1"


def test_best_epoch_skips_rows_with_missing_params(tmp_path):
    """A scores.txt row whose epoch file never landed (crash between the score
    append and the checkpoint write, or a deleted file) must not win: every
    caller loads the params next."""
    d = str(tmp_path)
    for e, s in [(0, 0.1), (1, 0.9), (2, 0.3)]:
        ckpt.append_score(d, e, s)
        if e != 1:  # best-scoring epoch's params are missing
            ckpt.save_state(ckpt.epoch_path(d, e), _state())
    assert ckpt.best_epoch(d) == (2, 0.3)
    # no surviving params at all → None → best_or_latest falls to file scan
    os.remove(ckpt.epoch_path(d, 0))
    os.remove(ckpt.epoch_path(d, 2))
    assert ckpt.best_epoch(d) is None


def test_best_or_latest_fallbacks(tmp_path):
    d = str(tmp_path)
    with pytest.raises(FileNotFoundError):
        ckpt.best_or_latest(d)
    ckpt.save_state(ckpt.epoch_path(d, 2), _state())
    epoch, score = ckpt.best_or_latest(d)  # no scores.txt → newest checkpoint
    assert epoch == 2 and np.isnan(score)


def test_param_count():
    assert ckpt.param_count(_state()["params"]) == 9


def test_save_state_is_atomic_no_temp_residue(tmp_path):
    """save_state writes via temp + os.replace; the epoch scan never sees the
    temp file and a failed serialize leaves no residue behind."""
    d = str(tmp_path)
    ckpt.save_state(ckpt.epoch_path(d, 0), _state())
    assert os.listdir(d) == ["0000.params"]

    class Unserializable:
        pass

    with pytest.raises(Exception):
        ckpt.save_state(ckpt.epoch_path(d, 1), {"bad": Unserializable()})
    # no 0001.params and no .tmp.* residue
    assert os.listdir(d) == ["0000.params"]


def test_resume_state_quarantines_truncated_newest(tmp_path):
    """A kill mid-save under a non-atomic writer leaves a truncated newest
    .params; resume must quarantine it and restore the next-newest epoch
    instead of crashing or poisoning the run."""
    d = str(tmp_path)
    state = _state()
    for e in (0, 1):
        good = jax.tree_util.tree_map(lambda x, e=e: x + e, state)
        ckpt.save_state(ckpt.epoch_path(d, e), good)
    # simulate the torn write: epoch 2 exists but is truncated garbage
    full = open(ckpt.epoch_path(d, 1), "rb").read()
    with open(ckpt.epoch_path(d, 2), "wb") as f:
        f.write(full[: len(full) // 3])

    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    start_epoch, restored = ckpt.resume_state(d, zero)
    # fell back to epoch 1 (the newest READABLE checkpoint)
    assert start_epoch == 2
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]),
        np.asarray(state["params"]["w"]) + 1)
    # the bad file is quarantined, not deleted, and out of the epoch scan
    assert os.path.exists(os.path.join(d, "0002.params.corrupt"))
    assert ckpt.list_epochs(d) == [0, 1]
    # a fresh resume now restores epoch 1 directly
    start_epoch2, _ = ckpt.resume_state(d, zero)
    assert start_epoch2 == 2


def test_resume_state_mismatch_raises_and_preserves_file(tmp_path):
    """A checkpoint whose BYTES parse cleanly but whose structure differs from
    the template (wrong architecture flags on the relaunch) must raise loudly
    with the file intact — NOT quarantine every valid epoch and silently
    restart from 0."""
    d = str(tmp_path)
    state = _state()
    ckpt.save_state(ckpt.epoch_path(d, 0), state)

    wrong_template = {"params": {"different_layer": jnp.zeros((3,))}}
    with pytest.raises(ValueError, match="mismatch"):
        ckpt.resume_state(d, wrong_template)
    # nothing quarantined, nothing renamed: the checkpoint is still the newest
    assert os.listdir(d) == ["0000.params"]
    # the right template still resumes from it
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    start_epoch, restored = ckpt.resume_state(d, zero)
    assert start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"]))


def test_resume_state_empty_dir_returns_target(tmp_path):
    zero = jax.tree_util.tree_map(jnp.zeros_like, _state())
    start_epoch, restored = ckpt.resume_state(str(tmp_path), zero)
    assert start_epoch == 0
    assert restored is zero


def test_orbax_roundtrip(tmp_path):
    """The pod-scale checkpoint variant (save_state_orbax/load_state_orbax):
    directory checkpoints restoring into a template, same selection surface."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    path = os.path.join(str(tmp_path), "0003.orbax")
    state = _state()
    ckpt.save_state_orbax(path, state)
    assert os.path.isdir(path)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ckpt.load_state_orbax(path, zero)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["b"]), np.asarray(state["params"]["b"])
    )
    assert int(restored["step"]) == 7
    # overwrite (force=True) must succeed, like re-saving an epoch after resume
    ckpt.save_state_orbax(path, restored)
    again = ckpt.load_state_orbax(path, zero)
    assert int(again["step"]) == 7


def test_load_state_restores_device_placement(tmp_path):
    """from_bytes yields host numpy; load_state must re-place restored leaves
    on the template's sharding — a numpy param tree re-uploads to device on
    EVERY jitted call that consumes it (per-batch over the TPU tunnel in the
    driver eval loops)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    path = ckpt.epoch_path(str(tmp_path), 0)
    state = _state()
    ckpt.save_state(path, state)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("data",))
    template = jax.device_put(
        jax.tree_util.tree_map(np.zeros_like, jax.device_get(state)),
        NamedSharding(mesh, P()),
    )
    restored = ckpt.load_state(path, template)
    for leaf in jax.tree_util.tree_leaves(restored):
        assert isinstance(leaf, jax.Array)
        assert leaf.sharding == NamedSharding(mesh, P())
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))

    # a plain-numpy template stays on host (multihost pod-mesh contract)
    host_template = jax.tree_util.tree_map(np.zeros_like,
                                           jax.device_get(state))
    restored_host = ckpt.load_state(path, host_template)
    assert all(isinstance(l, np.ndarray)
               for l in jax.tree_util.tree_leaves(restored_host))


def test_ensure_live_backend_noop_when_initialized(monkeypatch):
    # once a backend exists (conftest pins the CPU platform) the guard must
    # return True without spawning the (150 s budget) probe subprocess
    from tennis_tpu.utils import tunnel

    jax.devices()

    def boom(*a, **k):
        raise AssertionError("probe subprocess must not run")

    monkeypatch.setattr(tunnel, "tpu_reachable", boom)
    assert tunnel.ensure_live_backend() is True


def test_tpu_reachable_timeout_is_unreachable(monkeypatch):
    # a hung axon registration surfaces as subprocess timeout -> False
    import subprocess

    from tennis_tpu.utils import tunnel

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert tunnel.tpu_reachable(timeout_s=0.01) is False


def test_async_checkpointer_roundtrip_and_order(tmp_path):
    """Queued saves land atomically, in order, with the values AT save() time
    (the snapshot must be immune to later in-place mutation of the state —
    the gnmt loop mutates opt_state.hyperparams between epochs)."""
    state = {"w": jnp.arange(4.0), "lr": np.asarray(1e-3)}
    with ckpt.AsyncCheckpointer() as writer:
        for epoch in range(3):
            state["w"] = state["w"] + 1.0
            state["lr"] = np.asarray(1e-3 * (epoch + 1))
            writer.save(ckpt.epoch_path(str(tmp_path), epoch), state)
        writer.wait()
    assert ckpt.list_epochs(str(tmp_path)) == [0, 1, 2]
    for epoch in range(3):
        raw = ckpt.load_raw(ckpt.epoch_path(str(tmp_path), epoch))
        np.testing.assert_allclose(raw["w"], np.arange(4.0) + epoch + 1)
        np.testing.assert_allclose(raw["lr"], 1e-3 * (epoch + 1))
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_resume_state_reraises_environmental_read_errors(tmp_path):
    """Only a failed PARSE proves corruption. An OSError on open/read (fd
    limits, permissions, transient I/O) must propagate — quarantining on it
    would rename every healthy checkpoint and silently restart from 0."""
    d = str(tmp_path)
    ckpt.save_state(ckpt.epoch_path(d, 0), _state())
    os.makedirs(ckpt.epoch_path(d, 1))  # open() → IsADirectoryError (OSError)
    zero = jax.tree_util.tree_map(jnp.zeros_like, _state())
    with pytest.raises(OSError):
        ckpt.resume_state(d, zero)
    # nothing was quarantined; epoch 0 is intact
    assert os.path.exists(ckpt.epoch_path(d, 0))
    assert not os.path.exists(ckpt.epoch_path(d, 0) + ".corrupt")


def test_async_checkpointer_submit_sequences_after_save(tmp_path):
    """submit(fn) runs after every earlier write — the trainers rely on this
    to make the scores.txt row durable only once its epoch file is."""
    d = str(tmp_path)
    seen = []
    with ckpt.AsyncCheckpointer() as writer:
        for e in range(2):
            writer.save(ckpt.epoch_path(d, e), _state())
            writer.submit(lambda e=e: seen.append(
                os.path.exists(ckpt.epoch_path(d, e))))
    assert seen == [True, True]


def test_async_checkpointer_save_fails_fast(tmp_path):
    """A failed write surfaces on the NEXT save, not only at close — training
    stops promptly instead of piling epochs onto a dead disk."""
    writer = ckpt.AsyncCheckpointer()
    target = tmp_path / "blocked"
    target.write_text("")  # directory path is a FILE → makedirs fails
    writer.save(str(target / "0000.params"), {"w": jnp.zeros(2)})
    with pytest.raises(Exception):
        writer.save(str(tmp_path / "0001.params"), {"w": jnp.zeros(2)})
    writer.close()
    # the second save never enqueued: no hole-after-failure on disk
    assert not os.path.exists(tmp_path / "0001.params")


def test_async_checkpointer_raises_on_wait(tmp_path):
    writer = ckpt.AsyncCheckpointer()
    target = tmp_path / "blocked"
    target.write_text("")  # make the directory path a FILE → makedirs fails
    writer.save(str(target / "0000.params"), {"w": jnp.zeros(2)})
    with pytest.raises(Exception):
        writer.wait()
    # the error is consumed: close() after a drained failure is clean
    writer.close()
