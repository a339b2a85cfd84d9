import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.models import CNNRNN, FrameModel, get_backbone
from tennis_tpu.parallel import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    sgd_with_schedule,
)
from tennis_tpu.parallel.mesh import shard_batch


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    assert mesh.axis_names == ("data", "model")


def test_mesh_data_model_split():
    mesh = make_mesh(num_data=4, num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(num_data=16, num_model=1)


def test_dp_train_step_runs_and_learns():
    mesh = make_mesh()
    model = CNNRNN(model=None, num_classes=4, hidden_size=8, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.1, lr_steps=(10,), steps_per_epoch=5)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 6, 12))
    y = jax.random.randint(rng, (16,), 0, 4)
    state = create_train_state(model, rng, x, tx, {"train": True})
    step = make_train_step(model, mesh=mesh, num_classes=4)

    xs, ys = shard_batch(mesh, (x, y))
    losses = []
    for _ in range(25):
        state, loss, logits, cm = step(state, xs, ys)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(np.asarray(cm).sum()) == 16  # one count per sample
    assert int(state.step) == 25


def test_dp_matches_single_device():
    """The mesh-sharded step must compute the same loss as unsharded jit."""
    model = CNNRNN(model=None, num_classes=3, hidden_size=4, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.05)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (8, 5, 6))
    y = jax.random.randint(rng, (8,), 0, 3)

    # two independent states (same rng → same values); the steps donate their input
    # buffers, so they must not alias
    state_a = create_train_state(model, rng, x, tx, {"train": True})
    state_b = create_train_state(model, rng, x, tx, {"train": True})

    mesh = make_mesh()
    step_dp = make_train_step(model, mesh=mesh)
    step_1d = make_train_step(model, mesh=None)

    xs, ys = shard_batch(mesh, (x, y))
    la, lb = None, None
    for _ in range(3):
        state_a, la, _ = step_dp(state_a, xs, ys)
        state_b, lb, _ = step_1d(state_b, x, y)
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)


def test_batchnorm_state_updates_under_mesh():
    mesh = make_mesh()
    model = FrameModel(get_backbone("resnet18_v2", dtype=jnp.float32),
                       num_classes=3, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.01)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 32, 32, 3))
    y = jax.random.randint(rng, (8,), 0, 3)
    state = create_train_state(model, rng, x, tx, {"train": True})
    before = jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))
    step = make_train_step(model, mesh=mesh)
    state, loss, _ = step(state, *shard_batch(mesh, (x, y)))
    after = jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))
    assert any(not np.allclose(a, b) for a, b in zip(before, after))

    ev = make_eval_step(model, num_classes=3)
    logits, cm = ev(state.params, state.batch_stats, x, y)
    assert logits.shape == (8, 3) and np.asarray(cm).sum() == 8


def test_lr_schedule_steps():
    tx, schedule = sgd_with_schedule(
        1.0, lr_steps=(2, 4), lr_factor=0.5, steps_per_epoch=10
    )
    assert float(schedule(0)) == 1.0
    assert float(schedule(19)) == 1.0
    assert float(schedule(20)) == 0.5
    assert float(schedule(40)) == 0.25


def test_sharded_input_layout():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_driver_harness_sharded_and_donating():
    """The production driver path (tennis_tpu/train.py): state created directly
    with its mesh shardings, preprocess fused into the step, donation recorded in
    the lowering, and the batch consumed sharded over the data axis."""
    from tennis_tpu.data.transforms import device_augment
    from tennis_tpu.parallel.sharding_rules import state_shardings

    mesh = make_mesh(num_data=4, num_model=2)
    model = FrameModel(get_backbone("resnet18_v2", dtype=jnp.float32),
                       num_classes=11, dtype=jnp.float32)
    tx, _ = sgd_with_schedule(0.01)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 32, 32, 3)), tx,
                               {"train": True}, mesh=mesh)
    sh = state_shardings(mesh, state)
    placed = jax.tree_util.tree_map(lambda v, s: v.sharding == s, state, sh)
    assert all(jax.tree_util.tree_leaves(placed))

    step = make_train_step(
        model, mesh=mesh, num_classes=11, rng_seed=7, state_sharding=sh,
        preprocess=lambda imgs, key: device_augment(imgs, key, dtype=jnp.float32),
    )
    x = np.random.default_rng(0).integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    y = np.random.default_rng(1).integers(0, 11, (8,))
    xs, ys = shard_batch(mesh, (x, y))

    # donation must be recorded for the state argument (the marker differs
    # between unpartitioned and mesh lowerings)
    txt = step.lower(state, xs, ys).as_text()
    assert "jax.buffer_donor" in txt or "tf.aliasing_output" in txt

    state, loss, logits, cm = step(state, xs, ys)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
    assert int(np.asarray(cm).sum()) == 8
    assert xs.sharding == batch_sharding(mesh)


def test_seq2seq_step_donates_and_shards():
    """Captioner step: host-seeded dropout, donation, optional DP sharding."""
    import optax

    from tennis_tpu.models.gnmt import (
        NMTModel, get_gnmt_encoder_decoder, masked_ce_loss,
    )
    from tennis_tpu.parallel import make_seq2seq_train_step

    enc, dec = get_gnmt_encoder_decoder(num_layers=2, num_bi_layers=1,
                                        hidden_size=8, dropout=0.1)
    model = NMTModel(vocab_size=12, encoder=enc, decoder=dec, embed_size=6)
    rng = jax.random.PRNGKey(0)
    src = np.random.default_rng(0).normal(size=(8, 5, 6)).astype(np.float32)
    tgt = np.random.default_rng(1).integers(0, 12, (8, 7)).astype(np.int32)
    src_vl = np.full((8,), 5, np.float32)
    tgt_vl = np.full((8,), 7, np.float32)
    variables = model.init(rng, jnp.asarray(src[:1]), jnp.asarray(tgt[:1, :-1]))
    params = variables["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    mesh = make_mesh(num_data=8, num_model=1)
    step = make_seq2seq_train_step(model, opt, masked_ce_loss, mesh=mesh)
    lowered = step.lower(params, {}, opt_state, *shard_batch(
        mesh, (src, tgt, src_vl, tgt_vl)), np.uint32(3))
    txt = lowered.as_text()
    assert "jax.buffer_donor" in txt or "tf.aliasing_output" in txt

    params, _, opt_state, loss = step(
        params, {}, opt_state, *shard_batch(mesh, (src, tgt, src_vl, tgt_vl)),
        np.uint32(3),
    )
    assert np.isfinite(float(loss))


def test_seq2seq_dp_matches_single_device():
    """The captioner's DP step (train_gnmt --num_devices) must compute the same
    losses as the single-device step — this BEATS the reference, which is
    single-GPU only (reference train_gnmt.py:126-129)."""
    import optax

    from tennis_tpu.models.gnmt import (
        NMTModel, get_gnmt_encoder_decoder, masked_ce_loss,
    )
    from tennis_tpu.parallel import make_seq2seq_train_step

    def build():
        enc, dec = get_gnmt_encoder_decoder(num_layers=2, num_bi_layers=1,
                                            hidden_size=8, dropout=0.0)
        return NMTModel(vocab_size=12, encoder=enc, decoder=dec, embed_size=6)

    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    src = r.normal(size=(8, 5, 6)).astype(np.float32)
    tgt = r.integers(0, 12, (8, 7)).astype(np.int32)
    src_vl = np.full((8,), 5, np.float32)
    tgt_vl = np.full((8,), 7, np.float32)

    model = build()
    variables = model.init(rng, jnp.asarray(src[:1]), jnp.asarray(tgt[:1, :-1]))
    opt = optax.adam(1e-2)

    mesh = make_mesh(num_data=8, num_model=1)
    step_dp = make_seq2seq_train_step(model, opt, masked_ce_loss, mesh=mesh)
    step_1d = make_seq2seq_train_step(model, opt, masked_ce_loss)

    pa = jax.tree_util.tree_map(np.copy, jax.device_get(variables["params"]))
    pb = jax.tree_util.tree_map(np.copy, jax.device_get(variables["params"]))
    oa, ob = opt.init(pa), opt.init(pb)
    batch_dp = shard_batch(mesh, (src, tgt, src_vl, tgt_vl))
    la = lb = None
    for i in range(3):
        pa, _, oa, la = step_dp(pa, {}, oa, *batch_dp, np.uint32(i))
        pb, _, ob, lb = step_1d(pb, {}, ob, src, tgt, src_vl, tgt_vl,
                                np.uint32(i))
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)


def test_seq2seq_sequence_parallel_memory_matches():
    """mem_sharding shards the attention memory's TIME axis over the mesh's
    model axis (sequence parallelism, SURVEY §5.7): GSPMD partitions every
    per-step attention softmax/context with collectives, and BOTH the
    teacher-forced forward and the beam decode must match the unsharded
    numerics. The reference decodes single-GPU in Python — no counterpart."""
    import optax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from tennis_tpu.models.gnmt import (
        NMTModel, get_gnmt_encoder_decoder, masked_ce_loss,
    )
    from tennis_tpu.parallel import make_seq2seq_train_step
    from tennis_tpu.translation import BeamSearchTranslator

    mesh = make_mesh(num_data=2, num_model=4)

    def build(mem_sharding=None):
        enc, dec = get_gnmt_encoder_decoder(num_layers=2, num_bi_layers=1,
                                            hidden_size=8, dropout=0.0)
        return NMTModel(vocab_size=12, encoder=enc, decoder=dec, embed_size=6,
                        mem_sharding=mem_sharding)

    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    B, T = 4, 8  # T divides the 4-way model axis
    src = r.normal(size=(B, T, 6)).astype(np.float32)
    tgt = r.integers(3, 12, (B, 7)).astype(np.int32)
    src_vl = np.array([8, 7, 5, 3], np.float32)  # ragged: masks cross shards
    tgt_vl = np.full((B,), 7, np.float32)

    plain = build()
    sp = build(NamedSharding(mesh, P("data", "model", None)))
    variables = plain.init(rng, jnp.asarray(src[:1]), jnp.asarray(tgt[:1, :-1]))

    # teacher-forced loss through the production step harness
    opt = optax.adam(1e-2)
    pa = jax.tree_util.tree_map(np.copy, jax.device_get(variables["params"]))
    pb = jax.tree_util.tree_map(np.copy, jax.device_get(variables["params"]))
    step_sp = make_seq2seq_train_step(sp, opt, masked_ce_loss, mesh=mesh)
    step_1d = make_seq2seq_train_step(plain, opt, masked_ce_loss)
    batch = shard_batch(mesh, (src, tgt, src_vl, tgt_vl))
    la = lb = None
    for i in range(2):
        pa, _, oa, la = step_sp(pa, {}, opt.init(pa) if i == 0 else oa,
                                *batch, np.uint32(i))
        pb, _, ob, lb = step_1d(pb, {}, opt.init(pb) if i == 0 else ob,
                                src, tgt, src_vl, tgt_vl, np.uint32(i))
    np.testing.assert_allclose(float(la), float(lb), rtol=2e-4)

    # beam decode with the sequence-parallel memory
    tr_sp = BeamSearchTranslator(sp, bos_id=1, eos_id=2, beam_size=3,
                                 max_length=6, mesh=mesh)
    tr_1d = BeamSearchTranslator(plain, bos_id=1, eos_id=2, beam_size=3,
                                 max_length=6)
    s_sp, sc_sp, l_sp = tr_sp.translate(variables, src, src_vl)
    s_1d, sc_1d, l_1d = tr_1d.translate(variables, src, src_vl)
    np.testing.assert_array_equal(np.asarray(s_sp), np.asarray(s_1d))
    np.testing.assert_allclose(np.asarray(sc_sp), np.asarray(sc_1d), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(l_sp), np.asarray(l_1d))


def test_bucket_sampler_batch_multiple():
    from tennis_tpu.data.bucketing import FixedBucketSampler

    lengths = list(range(1, 24))  # ragged tails in every bucket
    s = FixedBucketSampler(lengths, batch_size=8, num_buckets=3,
                           batch_multiple=4)
    batches = list(s)
    assert batches and all(len(b) % 4 == 0 for b in batches)
    assert len(batches) == len(s)
    # without the multiple, the same config yields ragged tails
    s1 = FixedBucketSampler(lengths, batch_size=8, num_buckets=3)
    assert any(len(b) % 4 for b in s1)
    assert len(list(s1)) == len(s1)

    # ratio-scaled bucket batch sizes round DOWN to the multiple so FULL
    # batches are never trimmed: at most batch_multiple-1 samples (the ragged
    # tail) may drop per bucket
    s2 = FixedBucketSampler(list(range(1, 38)), batch_size=4, num_buckets=3,
                            ratio=0.5, batch_multiple=3)
    batches = list(s2)
    assert all(len(b) % 3 == 0 for b in batches)
    assert len(batches) == len(s2)
    n_buckets = len(s2.buckets)
    dropped = 37 - sum(len(b) for b in batches)
    assert dropped <= (3 - 1) * n_buckets, dropped


def test_pod_mesh_single_process_and_host_slice():
    from tennis_tpu.parallel.distributed import host_batch_slice, make_pod_mesh

    mesh = make_pod_mesh(num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert host_batch_slice(64) == 64  # single process keeps the global batch


def test_sharded_eval_iter_single_host_exact():
    """The shared driver eval loop (data/loader.sharded_eval_iter): padded
    batches in, per-row outputs out, pad rows dropped — the concatenated rows
    equal a plain pass over the dataset in order."""
    import numpy as np

    from tennis_tpu.data.loader import DataLoader, sharded_eval_iter
    from tennis_tpu.parallel import batch_sharding, make_mesh

    class DS:
        def __len__(self):
            return 11  # not a multiple of the batch size → pad rows exist

        def __getitem__(self, i):
            img = np.full((4,), i, np.float32)
            return img, np.int32(i % 3), np.int32(i)

    mesh = make_mesh(num_data=2)
    loader = DataLoader(DS(), batch_size=4, num_workers=1, shuffle=False)
    host_batch = 4

    rows, labels, idxs = [], [], []
    for out, lab, idx in sharded_eval_iter(loader, host_batch, 11,
                                           batch_sharding(mesh),
                                           lambda images: images * 2.0):
        rows.append(out), labels.append(lab), idxs.append(idx)
    rows = np.concatenate(rows)
    labels = np.concatenate(labels)
    idxs = np.concatenate(idxs)
    assert rows.shape == (11, 4)
    np.testing.assert_array_equal(idxs, np.arange(11))
    np.testing.assert_array_equal(labels, np.arange(11) % 3)
    np.testing.assert_allclose(rows, np.tile(np.arange(11)[:, None] * 2.0,
                                             (1, 4)))
