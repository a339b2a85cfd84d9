"""Checkpoint / resume / model-selection conventions.

Keeps the reference's filesystem contract (reference train.py:286-295,487-497,
334-346) so existing tooling conventions hold:

- ``<exp_dir>/{epoch:04d}.params``     one file per epoch (msgpack'd pytree here);
- resume = scan for ``*.params``, take the newest epoch, continue at epoch+1;
- ``<exp_dir>/scores.txt``             appended ``<epoch>\\t<score>`` lines;
- best-epoch selection = argmax over scores.txt (AVG_NB_f1 for vision,
  BLEU for captioning), re-scanned by both trainer and evaluator;
- captioning adds ``valid_best.params`` written on BLEU improvement
  (reference train_gnmt.py:450-454), skipped by the resume scan.

Serialization is flax msgpack (host-resident, single file). For pod-scale states,
swap ``save_state``/``load_state`` for orbax async checkpointing — the naming and
selection conventions above stay unchanged.
"""
from __future__ import annotations

import os
import re

import jax
import numpy as np
from absl import logging
from flax import serialization

_EPOCH_RE = re.compile(r"^(\d{4})\.params$")


def _atomic_write(path: str, data: bytes) -> None:
    """Write via a same-directory temp file, fsync, then ``os.replace`` — a
    process killed mid-save can never leave a truncated ``.params`` that the
    resume scan would pick as the newest epoch."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def save_state(path: str, state) -> None:
    """Atomic checkpoint write (the reference writes in place, reference
    train.py:497; hardened here with the same temp+replace pattern used for
    the native .so build)."""
    _atomic_write(path, serialization.to_bytes(jax.device_get(state)))


def load_state(path: str, target):
    """Restore into a template pytree (shapes/dtypes from ``target``).

    Leaves whose template is a device-resident ``jax.Array`` are re-placed on
    the template's sharding: ``from_bytes`` yields host numpy, and a numpy
    param tree silently re-uploads on EVERY jitted call that consumes it —
    per-batch over the TPU tunnel in the eval loops. Non-addressable (pod
    mesh) shardings are left on host; pjit distributes those uniformly.
    """
    with open(path, "rb") as f:
        restored = serialization.from_bytes(target, f.read())
    return _place_like(target, restored)


def _place_like(target, restored):
    def place(t, r):
        sh = getattr(t, "sharding", None)
        if isinstance(t, jax.Array) and sh is not None and sh.is_fully_addressable:
            return jax.device_put(r, sh)
        return r

    return jax.tree_util.tree_map(place, target, restored)


def load_raw(path: str):
    """Restore a checkpoint as plain nested dicts without a template — for
    cross-model transplants (e.g. a vision experiment's backbone subtree into
    the captioner's src_embed, reference train_gnmt.py:152-161)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def epoch_path(exp_dir: str, epoch: int) -> str:
    return os.path.join(exp_dir, f"{epoch:04d}.params")


def list_epochs(exp_dir: str) -> list[int]:
    if not os.path.isdir(exp_dir):
        return []
    epochs = []
    for f in os.listdir(exp_dir):
        m = _EPOCH_RE.match(f)
        if m:
            epochs.append(int(m.group(1)))
    return sorted(epochs)


def latest_epoch(exp_dir: str) -> int | None:
    epochs = list_epochs(exp_dir)
    return epochs[-1] if epochs else None


def append_score(exp_dir: str, epoch: int, score: float) -> None:
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "scores.txt"), "a") as f:
        f.write(f"{epoch}\t{score}\n")


def best_epoch(exp_dir: str) -> tuple[int, float] | None:
    """Argmax epoch from scores.txt (reference train.py:334-346).

    Rows whose ``{epoch:04d}.params`` file is missing are skipped: every
    caller loads that file next, and a crash between the score append and the
    checkpoint write landing (or a deleted file) must not turn the best-epoch
    reload into a FileNotFoundError."""
    path = os.path.join(exp_dir, "scores.txt")
    if not os.path.exists(path):
        return None
    best = None
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                epoch, score = int(parts[0]), float(parts[1])
                if not os.path.exists(epoch_path(exp_dir, epoch)):
                    logging.warning(
                        "scores.txt row for epoch %d has no %s — skipping",
                        epoch, epoch_path(exp_dir, epoch))
                    continue
                if best is None or score > best[1]:
                    best = (epoch, score)
    return best


def best_or_latest(exp_dir: str) -> tuple[int, float]:
    """Best epoch by scores.txt, else the latest checkpoint (score nan), else
    FileNotFoundError — the selection rule every eval-side driver shares."""
    best = best_epoch(exp_dir)
    if best is None:
        latest = latest_epoch(exp_dir)
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoints or scores.txt in {exp_dir}")
        best = (latest, float("nan"))
    return best


def resume_epoch(exp_dir: str) -> int:
    """First epoch to run: newest checkpoint + 1, or 0 if none."""
    latest = latest_epoch(exp_dir)
    return 0 if latest is None else latest + 1


def resume_state(exp_dir: str, target) -> tuple[int, object]:
    """Crash-safe resume: walk checkpoints newest-first, restoring the first
    readable one. A file whose BYTES are unreadable (e.g. truncated by a crash
    under a pre-atomic writer, or a torn copy) is quarantined to
    ``<name>.corrupt`` and the scan continues with the next-newest epoch
    instead of poisoning the run. A file that parses but does not match the
    ``target`` template is an architecture/flag mismatch, NOT corruption — it
    raises with the checkpoint left intact rather than silently quarantining
    every valid epoch and restarting from 0. Returns ``(start_epoch, state)``
    — ``(0, target)`` when nothing restorable exists (same contract as
    ``resume_epoch`` + ``load_state``, reference train.py:286-295)."""
    for epoch in reversed(list_epochs(exp_dir)):
        path = epoch_path(exp_dir, epoch)
        # environmental read failures (fd limits, permissions, transient I/O)
        # propagate: the bytes may be healthy — only a failed PARSE proves
        # corruption worth quarantining
        with open(path, "rb") as f:
            raw = f.read()
        try:
            state_dict = serialization.msgpack_restore(raw)
        except Exception as e:
            quarantine = path + ".corrupt"
            try:
                os.replace(path, quarantine)
            except OSError:
                quarantine = "<rename failed>"
            logging.warning(
                "unreadable checkpoint %s (%s: %s) — quarantined to %s, "
                "trying the next-newest epoch", path, type(e).__name__, e,
                quarantine)
            continue
        try:
            restored = serialization.from_state_dict(target, state_dict)
        except Exception as e:
            raise ValueError(
                f"checkpoint {path} parsed cleanly but does not match the "
                f"model template — architecture/flag mismatch, not file "
                f"corruption; the file was left intact ({e})") from e
        return epoch + 1, _place_like(target, restored)
    return 0, target


def param_count(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


class AsyncCheckpointer:
    """Overlap the msgpack encode + disk write with the next epoch's compute.

    ``save(path, state)`` snapshots the state to host memory synchronously
    (``jax.device_get`` — it must complete before the caller's next donated
    train step invalidates the device buffers), then hands the encode and the
    atomic temp+``os.replace`` write to a single background worker. Tasks run
    in submission order, so the resume scan's newest-epoch rule only ever sees
    a consistent prefix of the saved epochs; ``submit(fn)`` sequences an
    arbitrary side effect behind every earlier write (the trainers use it to
    append the scores.txt row only AFTER its epoch file is durable, so a crash
    can never leave a best-epoch row pointing at a missing checkpoint).

    Memory and failure are both bounded: ``save`` first blocks until all
    earlier tasks finish — at most ONE snapshot of the full state is ever
    pinned on host beyond the caller's — and re-raises the first prior
    failure, so training fails fast instead of piling holes onto a dead disk.
    ``wait()`` drains and re-raises; it runs automatically on context-manager
    exit — call it before any same-process reader (best-epoch reload,
    evaluators) touches the files.

    The reference writes synchronously on the training thread
    (reference train.py:497); the overlap is a TPU-side improvement — the
    device sits idle during a multi-hundred-MB serialize otherwise.
    """

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer")
        self._futures: list = []

    def save(self, path: str, state) -> None:
        self.wait()  # bound in-flight snapshots to one; fail fast on errors
        host_state = jax.device_get(state)
        self._futures.append(self._pool.submit(
            lambda: _atomic_write(path, serialization.to_bytes(host_state))))

    def submit(self, fn) -> None:
        """Run ``fn()`` on the writer thread, after every earlier task."""
        self._futures.append(self._pool.submit(fn))

    def wait(self) -> None:
        """Drain pending tasks; re-raise the first error (once)."""
        futures, self._futures = self._futures, []
        try:
            for f in futures:
                f.result()
        except BaseException:
            # surface later failures in the same drain to the log instead of
            # swallowing them with the list
            for g in futures:
                if g is not f and g.exception() is not None:
                    logging.warning("additional checkpoint-write failure: %s",
                                    g.exception())
            raise

    def close(self) -> None:
        try:
            self.wait()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()
            return False
        # exceptional unwind: still drain + shut the pool down (no leaked
        # writer thread per in-process invocation), but never let a
        # writer-thread failure MASK the exception already in flight
        try:
            self.close()
        except BaseException as e:
            logging.warning("checkpoint writer failed during unwind: %s", e)
        return False


# ------------------------------------------------------------- orbax backend
# For pod-scale states (sharded params that don't fit one host), the msgpack
# single-file format above is replaced by orbax directory checkpoints; the epoch
# naming/scores conventions stay identical (``{epoch:04d}.orbax`` directories).


def save_state_orbax(path: str, state) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_state_orbax(path: str, target):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)
