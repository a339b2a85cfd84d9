"""Real 2-process multihost integration: jax.distributed over localhost.

Spawns two subprocesses, each a CPU backend with 4 virtual devices, that
initialize a distributed jax cluster, build the DCN×ICI pod mesh, assemble a
global batch from per-host loader stripes, run one jitted sharded computation,
and fetch the global result — exercising initialize_multihost / make_pod_mesh /
host_batch_slice / fetch_global / make_array_from_process_local_data together,
which no single-process test can (SURVEY §5.8's "test multi-node without a
cluster").
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
sys.path.insert(0, "@@REPO@@")
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]

from tennis_tpu.parallel.distributed import (
    fetch_global, host_batch_slice, initialize_multihost, make_pod_mesh,
)

initialize_multihost(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4

mesh = make_pod_mesh(num_model=1)
assert dict(mesh.shape) == {"data": 8, "model": 1}, dict(mesh.shape)

# tensor-parallel axis must tile INSIDE one host's devices (ICI, never DCN)
mesh_tp = make_pod_mesh(num_model=2)
assert dict(mesh_tp.shape) == {"data": 4, "model": 2}
for row in mesh_tp.devices:
    assert len({d.process_index for d in row}) == 1

from tennis_tpu.data.loader import DataLoader, prefetch_to_device
from tennis_tpu.parallel.mesh import batch_sharding


class _Range:
    def __init__(self, n):
        self.n = n
    def __len__(self):
        return self.n
    def __getitem__(self, i):
        return (np.full((4,), i, np.float32), np.int32(i % 3), np.int32(i))


GLOBAL_BATCH = 8
ds = _Range(19)  # not a multiple of anything: stripes must still agree
# drop_last: a ragged global batch cannot be assembled into an evenly-
# sharded jax.Array (the driver pads instead; either policy keeps lockstep)
loader = DataLoader(ds, batch_size=host_batch_slice(GLOBAL_BATCH), shuffle=True,
                    seed=7, num_shards=jax.process_count(),
                    shard_id=jax.process_index(), drop_last=True)

sharding = batch_sharding(mesh)
fn = jax.jit(lambda x: x * 2.0 + 1.0, in_shardings=sharding)

sums = []
n_batches = 0
for x, y, idx in prefetch_to_device(iter(loader), sharding):
    out = fn(x)
    assert not out.is_fully_addressable  # genuinely multi-host sharded
    g = fetch_global(out)  # collective: both hosts in lockstep
    assert g.shape[0] == GLOBAL_BATCH
    # the global rows are process-major stripes — the property run_eval's
    # per-stripe valid-row slicing relies on
    half = GLOBAL_BATCH // 2
    from tennis_tpu.parallel.distributed import fetch_local
    local = fetch_local(x)
    np.testing.assert_allclose(g[pid * half:(pid + 1) * half], local * 2.0 + 1.0,
                               rtol=1e-6)
    sums.append(float(g.sum()))
    n_batches += 1

# exact padded eval: the wrap-duplicate mask (train.py run_eval rule — shard
# p's stripe element j is a duplicate iff p + j*num_shards >= n) must count
# every dataset row exactly once, making pod metrics equal the single-host pass
from tennis_tpu.parallel.mesh import pad_batch

host_batch = host_batch_slice(GLOBAL_BATCH)
loader_ev = DataLoader(ds, batch_size=host_batch,
                       num_shards=jax.process_count(),
                       shard_id=jax.process_index())
procs = jax.process_count()
seen = []
stripe_off = 0

def padded():
    for batch in iter(loader_ev):
        yield pad_batch(batch, host_batch)

for (x, y, idx), n in prefetch_to_device(padded(), sharding):
    g_idx = fetch_global(idx)
    pos = stripe_off + np.arange(n)
    keep = np.concatenate([
        (p * host_batch + np.arange(n))[p + pos * procs < len(ds)]
        for p in range(procs)
    ])
    stripe_off += n
    seen.extend(np.asarray(g_idx)[keep].tolist())
assert sorted(seen) == list(range(len(ds))), sorted(seen)

# the production training harness over the pod mesh: tiny DenseNet FrameModel,
# donated sharded step, per-host batch stripes; losses must agree globally
import jax.numpy as jnp

from tennis_tpu.models import FrameModel
from tennis_tpu.models.backbones.densenet import DenseNet, DenseNetSpec
from tennis_tpu.parallel import create_train_state, make_train_step, sgd_with_schedule
from tennis_tpu.parallel.sharding_rules import state_shardings

spec = DenseNetSpec((2, 2), growth_rate=8, num_init_features=16, bn_size=2)
model = FrameModel(DenseNet(spec, dtype=jnp.float32), num_classes=3,
                   dtype=jnp.float32)
tx, _ = sgd_with_schedule(0.01)
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3), jnp.float32), tx,
                           {"train": True}, mesh=mesh)
step = make_train_step(model, mesh=mesh,
                       state_sharding=state_shardings(mesh, state))

rng = np.random.default_rng(0)  # same seed on both hosts; loader-style stripes
losses = []
for i in range(2):
    imgs_global = rng.standard_normal((GLOBAL_BATCH, 16, 16, 3)).astype(np.float32)
    labels_global = rng.integers(0, 3, (GLOBAL_BATCH,)).astype(np.int32)
    half = GLOBAL_BATCH // 2
    lo, hi = pid * half, (pid + 1) * half  # this host's stripe
    imgs = jax.make_array_from_process_local_data(sharding, imgs_global[lo:hi])
    labels = jax.make_array_from_process_local_data(sharding, labels_global[lo:hi])
    state, loss, _logits = step(state, imgs, labels)
    losses.append(float(fetch_global(loss).ravel()[0]))
assert all(np.isfinite(l) for l in losses), losses
assert int(fetch_global(state.step)) == 2

# ---- the captioner over the SAME 2-process pod mesh: one sharded seq2seq
# train step and a sharded beam decode must equal the single-process run
# exactly (the reference's captioner is pinned to 1 GPU,
# reference train_gnmt.py:126-129; this is the path that beats that limit)
import optax

from tennis_tpu.models.gnmt import (NMTModel, get_gnmt_encoder_decoder,
                                    masked_ce_loss)
from tennis_tpu.parallel import make_seq2seq_train_step
from tennis_tpu.translation import BeamSearchTranslator

jax.config.update("jax_default_matmul_precision", "highest")

enc, dec = get_gnmt_encoder_decoder(hidden_size=16, num_layers=2,
                                    num_bi_layers=1)
nmt = NMTModel(vocab_size=11, encoder=enc, decoder=dec, embed_size=8)
rng2 = jax.random.PRNGKey(5)
Bc = GLOBAL_BATCH
src_g = np.asarray(jax.random.normal(rng2, (Bc, 6, 12), jnp.float32))
tgt_g = np.asarray(jax.random.randint(rng2, (Bc, 5), 0, 11), np.int32)
src_vl_g = np.full((Bc,), 6, np.int32)
tgt_vl_g = np.full((Bc,), 5, np.int32)
variables = jax.jit(nmt.init)(rng2, jnp.asarray(src_g[:1]),
                              jnp.asarray(tgt_g[:1, :-1]))
params_host = jax.device_get(variables["params"])
opt = optax.adam(1e-3)

# single-process reference on this host's local devices (identical on both
# hosts: same seed, same global batch). Steps donate params -> fresh copies.
copy_tree = lambda t: jax.tree_util.tree_map(np.array, t)
step_ref = make_seq2seq_train_step(nmt, opt, masked_ce_loss, mesh=None)
p_ref = copy_tree(params_host)
_, _, _, loss_ref = step_ref(p_ref, {}, opt.init(copy_tree(params_host)),
                             src_g, tgt_g, src_vl_g, tgt_vl_g, np.uint32(0))
loss_ref = float(loss_ref)
tr_ref = BeamSearchTranslator(nmt, bos_id=1, eos_id=2, beam_size=2,
                              max_length=6)
samp_ref, _, len_ref = tr_ref.translate({"params": params_host}, src_g,
                                        src_vl_g)

# pod-mesh run: this host's stripe rows assembled into global arrays
halfc = Bc // jax.process_count()
mk = lambda a: jax.make_array_from_process_local_data(
    sharding, a[pid * halfc:(pid + 1) * halfc])
step_pod = make_seq2seq_train_step(nmt, opt, masked_ce_loss, mesh=mesh)
_, _, _, loss_pod = step_pod(copy_tree(params_host), {},
                             opt.init(copy_tree(params_host)),
                             mk(src_g), mk(tgt_g), mk(src_vl_g), mk(tgt_vl_g),
                             np.uint32(0))
loss_pod = float(fetch_global(loss_pod).ravel()[0])
assert abs(loss_pod - loss_ref) < 2e-4, (loss_pod, loss_ref)

tr_pod = BeamSearchTranslator(nmt, bos_id=1, eos_id=2, beam_size=2,
                              max_length=6, mesh=mesh)
samp_pod, _, len_pod = tr_pod.translate({"params": params_host}, mk(src_g),
                                        mk(src_vl_g))
assert np.array_equal(len_pod, len_ref), (len_pod, len_ref)
assert np.array_equal(samp_pod, samp_ref)

# both hosts must have seen identical batch counts and identical global values
print("RESULT", n_batches, " ".join(f"{s:.3f}" for s in sums),
      " ".join(f"{l:.5f}" for l in losses),
      f"s2s {loss_pod:.5f} beam {samp_pod.shape}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@@REPO@@", repo))
    port = _free_port()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append([l for l in out.splitlines() if l.startswith("RESULT")][0])

    # identical batch counts and identical global results on both hosts
    assert outs[0] == outs[1], outs
    n_batches = int(outs[0].split()[1])
    assert n_batches == 2  # ceil(19/2)=10 per stripe, drop_last at 4


def test_fetch_local_rejects_non_batch_sharding():
    """local_rows' guard must raise the pointed ValueError (not a TypeError
    from hashing slice objects — slices are unhashable before Python 3.12)
    when a leaf is split along a non-batch axis, and must deduplicate
    model-axis replicas of the same row range."""
    import numpy as np

    from tennis_tpu.parallel.distributed import fetch_local

    class _Shard:
        def __init__(self, index, data):
            self.index, self.data = index, data

    class _Leaf:
        is_fully_addressable = False

        def __init__(self, shards):
            self.addressable_shards = shards

    full = np.arange(12, dtype=np.float32).reshape(4, 3)
    # split along axis 1: no host-local row interpretation
    col_split = _Leaf([
        _Shard((slice(0, 4), slice(0, 2)), full[:, 0:2]),
        _Shard((slice(0, 4), slice(2, 3)), full[:, 2:3]),
    ])
    with pytest.raises(ValueError, match="non-batch axis"):
        fetch_local(col_split)

    # batch split with a model-axis replica of rows 0:2 — one copy survives
    replicated = _Leaf([
        _Shard((slice(0, 2), slice(0, 3)), full[0:2]),
        _Shard((slice(0, 2), slice(0, 3)), full[0:2]),
        _Shard((slice(2, 4), slice(0, 3)), full[2:4]),
    ])
    np.testing.assert_array_equal(fetch_local(replicated), full)
