r"""Multi-host (pod) entry: ``jax.distributed`` wiring + DCN×ICI mesh construction.

The reference is strictly single-host (SURVEY §5.8: gluon Trainer over an
in-process kvstore, no NCCL/MPI anywhere). The TPU-native equivalent of "more
than one machine" is:

1. every host process calls :func:`initialize_multihost` before first jax use
   (TPU pods auto-discover the coordinator from the environment; explicit
   coordinator/process args support CPU/GPU-style bring-up);
2. :func:`make_pod_mesh` lays the ``data`` axis across hosts (DCN) × local
   devices (ICI) and keeps the ``model`` (tensor-parallel) axis INSIDE one
   host's ICI domain, so TP collectives never ride DCN;
3. the data layer partitions the sample index space per host via the loaders'
   ``num_shards=jax.process_count() / shard_id=jax.process_index()`` arguments
   (seeded epoch permutations keep hosts in agreement — tennis_tpu.data.loader).

Example 2-host run (4 chips each):

    # host 0                                  # host 1
    python -m tennis_tpu.train --multihost \  python -m tennis_tpu.train --multihost \
        --coordinator=10.0.0.1:1234 \             --coordinator=10.0.0.1:1234 \
        --num_hosts=2 --host_id=0 ...             --num_hosts=2 --host_id=1 ...

On real TPU pods the three coordinator flags can be omitted — jax discovers the
topology from the runtime environment.

Host fetches of globally-sharded arrays (metrics, eval logits) go through
:func:`fetch_global`: ``device_get`` on a non-fully-addressable array raises,
so multi-host runs all-gather through
``jax.experimental.multihost_utils.process_allgather`` in lockstep (the
loaders' equal-length shard stripes guarantee every host reaches the same
collectives). The canonical full-set eval numbers still come from the
single-host evaluate.py pass.
"""
from __future__ import annotations

import numpy as np

from tennis_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


def fetch_global(tree):
    """Host numpy copy of a pytree of possibly multi-host-sharded arrays.

    Fully-addressable arrays (single host) use a plain ``device_get``;
    otherwise the global values are assembled with ``process_allgather`` — a
    collective, so EVERY process must call this at the same point. Pass
    everything a loop iteration needs as ONE tree: over the tunneled TPU each
    fetch is a network round trip.
    """
    import jax

    as_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    leaves = jax.tree_util.tree_leaves(tree)
    if all(getattr(l, "is_fully_addressable", True) for l in leaves):
        return as_np(jax.device_get(tree))
    from jax.experimental import multihost_utils

    return as_np(multihost_utils.process_allgather(tree, tiled=True))


def fetch_local(tree):
    """This process's rows of batch-sharded arrays (host-local stripe, global
    row order preserved within the stripe). Fully-addressable trees are a
    single ``device_get``; otherwise each leaf concatenates its addressable
    shards. Unlike :func:`fetch_global` this is NOT a collective — use it when
    every host handles only its own slice (e.g. feature dumps).
    """
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if all(getattr(l, "is_fully_addressable", True) for l in leaves):
        return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))

    def local_rows(x):
        # One shard per distinct index tuple: under model-axis replication
        # (make_pod_mesh(num_model>1)) each batch-row range is materialized on
        # every model-axis device, so keeping all addressable shards would
        # duplicate rows. Non-batch axes must not be sharded here — a leaf
        # split along the model axis has no host-local row interpretation.
        uniq = {}
        for s in x.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            uniq.setdefault(key, s)
        shards = sorted(uniq.values(), key=lambda s: s.index[0].start or 0)
        # normalize like the dedup key: slice objects are unhashable pre-3.12
        non_batch = {tuple((sl.start, sl.stop) for sl in s.index[1:])
                     for s in shards}
        if len(non_batch) > 1:
            raise ValueError(
                "fetch_local needs batch-only sharding; leaf is split along a "
                f"non-batch axis ({len(non_batch)} distinct column ranges)"
            )
        return np.concatenate([np.asarray(s.data) for s in shards])

    return jax.tree_util.tree_map(local_rows, tree)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Call ``jax.distributed.initialize`` exactly once, before any backend use.

    Safe to call when already initialized (logs and returns).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_pod_mesh(num_model: int = 1):
    """(data, model) mesh spanning every process.

    Single-process: identical to :func:`tennis_tpu.parallel.mesh.make_mesh`.
    Multi-process: a hybrid DCN×ICI device layout — the data axis covers
    ``process_count × (local_devices / num_model)`` and the model axis tiles
    within each host, so tensor-parallel all-gathers stay on ICI while only the
    gradient all-reduce crosses DCN (the bandwidth-appropriate split).
    """
    import jax
    from jax.sharding import Mesh

    if jax.process_count() == 1:
        return make_mesh(num_model=num_model)

    local = jax.local_device_count()
    if local % num_model:
        raise ValueError(
            f"num_model={num_model} must divide local device count {local}"
        )
    from jax.experimental import mesh_utils

    try:
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // num_model, num_model),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
    except ValueError:
        # Backends without per-slice topology (multi-process CPU simulation; a
        # multi-process single-slice pod): group devices by owning process —
        # the same process-major, model-axis-innermost layout the hybrid mesh
        # produces, just without slice metadata.
        ordered = sorted(jax.devices(),
                         key=lambda d: (d.process_index, d.id))
        devices = np.array(ordered).reshape(
            jax.process_count() * (local // num_model), num_model
        )
    return Mesh(np.asarray(devices).reshape(-1, num_model),
                (DATA_AXIS, MODEL_AXIS))


def host_batch_slice(global_batch: int) -> int:
    """Per-host batch size for a host-sharded loader feeding a global batch."""
    import jax

    if global_batch % jax.process_count():
        raise ValueError(
            f"global batch {global_batch} must divide across "
            f"{jax.process_count()} hosts"
        )
    return global_batch // jax.process_count()
