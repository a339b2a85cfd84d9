"""Host data loader: threaded decode/geometry workers + device prefetch.

Replaces gluon's process-based ``DataLoader(num_workers=N)`` (reference
train.py:187-193). cv2 releases the GIL during JPEG decode/resize, so a thread pool
gets the same parallelism without fork/pickle overheads. Batches come out as stacked
numpy (uint8 images / int32 labels); ``prefetch_to_device`` overlaps the host pipeline
with device compute via a small ring of already-transferred (sharded) batches.

Multi-host: pass ``num_shards``/``shard_id`` (e.g. ``jax.process_count()`` /
``jax.process_index()``) — the deterministic epoch permutation is shared (seeded),
each host takes a disjoint stripe, matching §5.8 of the design survey.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np

import jax


def _default_collate(samples: Sequence):
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return tuple(_default_collate([s[i] for s in samples])
                     for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    return np.asarray(samples)


class DataLoader:
    """Iterate a map-style dataset in batches with threaded sample loading."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = False,
        collate_fn: Callable = _default_collate,
        num_shards: int = 1,
        shard_id: int = 0,
        transform: Callable | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.transform = transform
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reseeds the shuffle; all hosts calling this agree on the permutation."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            # equal-length stripes: pad the permutation to a multiple of
            # num_shards by wrapping, so every host sees the same batch count
            # (hosts run collectives in lockstep; unequal counts deadlock).
            # Shard s's stripe element j sits at padded position s + j*num_shards;
            # positions >= n are the wrapped duplicates — multi-host eval masks
            # them out by this rule (train.py run_eval), making pod metrics
            # exactly equal to the single-host pass
            per = -(-n // self.num_shards)
            idx = np.resize(idx, per * self.num_shards)
        return idx[self.shard_id :: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, i: int):
        sample = self.dataset[int(i)]
        if self.transform is not None:
            sample = self.transform(sample)
        return sample

    def __iter__(self) -> Iterator:
        idx = self._indices()
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(idx), self.batch_size):
                chunk = idx[start : start + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                samples = list(pool.map(self._fetch, chunk))
                yield self.collate_fn(samples)


def prefetch_to_device(iterator, sharding=None, buffer_size: int = 2,
                       stats: dict | None = None):
    """Move batches to device ahead of compute — a TWO-stage pipeline.

    Stage 1 (source thread) pulls host batches from ``iterator`` into a host
    queue; stage 2 (transfer thread) ``jax.device_put``s them (with
    ``sharding``, e.g. the mesh batch sharding) into a device queue the
    consumer reads. Two stages matter: a single producer serializes decode and
    transfer, so with a slow interconnect (the tunneled chip: ~4 s per 100 MB
    batch) the pipeline degrades to decode+transfer per batch even though the
    loader could decode batch k+1 WHILE batch k streams to the device — the
    round-4 e2e row measured 13.7 fps against a 31 fps transfer leg from
    exactly this serialization.

    ``stats`` (optional dict) accumulates overlap accounting the caller can
    turn into an attribution row: ``source_s`` (time blocked on the upstream
    iterator — decode), ``device_put_s`` (time inside device_put / global
    array assembly, the GIL-holding transfer share), ``queue_full_s`` (time
    the transfer thread waited on a full device queue — consumer-bound), and
    ``batches``.
    """
    import time

    if stats is not None:
        for k in ("source_s", "device_put_s", "queue_full_s"):
            stats.setdefault(k, 0.0)
        stats.setdefault("batches", 0)

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jnp_device_put_default, batch)

        def _put(x):
            if not isinstance(x, np.ndarray):
                return x
            if not sharding.is_fully_addressable:
                # multi-host: this process holds only its stripe of the global
                # batch; assemble the global jax.Array from per-process data
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)

        return jax.tree_util.tree_map(_put, batch)

    host_q: queue.Queue = queue.Queue(maxsize=buffer_size)
    dev_q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    err = []
    stop = threading.Event()  # consumer abandoned the generator early

    def _bounded_put(q, item) -> bool:
        # bounded put: if the consumer broke out of its loop, the queue stays
        # full forever — a blocking put would pin the thread (and any
        # device-resident batches) for process life
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def source():
        try:
            it = iter(iterator)
            while True:
                tic = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                if stats is not None:
                    stats["source_s"] += time.perf_counter() - tic
                if not _bounded_put(host_q, batch):
                    return
        except Exception as e:  # surface loader errors on the consumer side
            err.append(e)
        finally:
            _bounded_put(host_q, sentinel)

    def transfer():
        try:
            while True:
                try:
                    item = host_q.get(timeout=0.1)
                except queue.Empty:
                    if stop.is_set():
                        return
                    continue
                if item is sentinel:
                    break
                tic = time.perf_counter()
                item = put(item)
                toc = time.perf_counter()
                if not _bounded_put(dev_q, item):
                    return
                if stats is not None:
                    stats["device_put_s"] += toc - tic
                    stats["queue_full_s"] += time.perf_counter() - toc
                    stats["batches"] += 1
        except Exception as e:
            err.append(e)
        finally:
            # deliver the sentinel unless the consumer already walked away
            # (then nobody reads the queue again and it would never drain)
            _bounded_put(dev_q, sentinel)

    threading.Thread(target=source, daemon=True).start()
    threading.Thread(target=transfer, daemon=True).start()
    try:
        while True:
            item = dev_q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # GeneratorExit / exception on the consumer side


def jnp_device_put_default(x):
    return jax.device_put(x) if isinstance(x, np.ndarray) else x


def padded_batch(arrays: Sequence[np.ndarray], pad_value=0, axis: int = 0):
    """Stack variable-length arrays, padding the first axis to the batch max
    (gluonnlp ``batchify.Pad`` equivalent, reference utils/captioning.py:33-37).
    Returns (stacked, lengths)."""
    lengths = np.asarray([a.shape[axis] for a in arrays], dtype=np.int32)
    max_len = int(lengths.max())
    out = []
    for a in arrays:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, max_len - a.shape[axis])
        out.append(np.pad(a, pad, constant_values=pad_value))
    return np.stack(out), lengths


def global_keep_indices(stripe_off: int, n: int, host_batch: int, procs: int,
                        n_total: int) -> np.ndarray:
    """Row indices to keep from a process-major gathered eval batch.

    The gathered array is ``procs`` stripes of ``host_batch`` rows; the first
    ``n`` of each stripe are loader rows (the rest ``pad_batch`` padding), and
    shard ``p``'s stripe element ``j`` is one of ``DataLoader._indices``'s
    wrap-padded duplicates iff ``p + j*procs >= n_total`` — masking those makes
    pod-mode metrics exactly equal to the single-host pass. ``stripe_off`` is
    the running count of loader rows consumed from each stripe so far.
    """
    pos = stripe_off + np.arange(n)
    return np.concatenate([
        (p * host_batch + np.arange(n))[p + pos * procs < n_total]
        for p in range(procs)
    ])


def sharded_eval_iter(loader, host_batch: int, n_total: int, sharding, step):
    """Drive a jitted eval ``step`` over a (possibly multi-host) loader.

    The one eval loop shared by the drivers (train.run_eval,
    train._pooled_final_test, evaluate.evaluate_model): pad each host batch to
    the static ``host_batch``, prefetch to device under ``sharding``, run
    ``step(images)``, gather the outputs, and drop pad rows AND the loader's
    wrap-padded duplicate rows, so the concatenation of the yielded rows is
    exactly a single-host pass over the dataset.

    The per-batch gather is one host fetch (a collective under multi-host;
    every host reaches it in lockstep thanks to equal loader stripes). The
    gathered arrays are GLOBAL: process-major stripes of ``host_batch`` rows
    each, with the first ``n`` of every stripe valid.

    Yields ``(out, labels, idxs)`` numpy row-blocks per batch.
    """
    from tennis_tpu.parallel.distributed import fetch_global
    from tennis_tpu.parallel.mesh import pad_batch

    def padded():
        for batch in iter(loader):
            yield pad_batch(batch, host_batch)

    stripe_off = 0
    for (images, labels, idxs), n in prefetch_to_device(padded(), sharding):
        out = step(images)
        out, labels, idxs = fetch_global((out, labels, idxs))
        keep = global_keep_indices(stripe_off, n, host_batch,
                                   out.shape[0] // host_batch, n_total)
        stripe_off += n
        yield out[keep], labels[keep], idxs[keep]
