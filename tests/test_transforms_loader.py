import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.data import transforms as T
from tennis_tpu.data.loader import DataLoader, padded_batch, prefetch_to_device
from tennis_tpu.parallel import batch_sharding, make_mesh


def test_resize_shorter_and_center_crop():
    img = np.zeros((100, 200, 3), np.uint8)
    r = T.resize_shorter(img, 50)
    assert r.shape[:2] == (50, 100)
    c = T.center_crop(r, 50)
    assert c.shape == (50, 50, 3)


def test_test_geometry_shape():
    img = np.random.default_rng(0).integers(0, 255, (300, 400, 3), dtype=np.uint8)
    out = T.test_geometry(img, 128)
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8


def test_random_resized_crop_deterministic_with_seed():
    img = np.random.default_rng(0).integers(0, 255, (80, 120, 3), dtype=np.uint8)
    a = T.random_resized_crop(img, 32, np.random.default_rng(5))
    b = T.random_resized_crop(img, 32, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3)


def test_device_prepare_normalizes():
    batch = np.full((2, 8, 8, 3), 255, np.uint8)
    out = np.asarray(T.device_prepare(batch, dtype=jnp.float32))
    expected = (1.0 - np.asarray(T.IMAGENET_MEAN)) / np.asarray(T.IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_normalize_six_channel():
    x = jnp.zeros((1, 4, 4, 6))
    out = np.asarray(T.normalize(x))
    expected = -np.asarray(T.TWO_STREAM_MEAN) / np.asarray(T.TWO_STREAM_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_device_augment_jits_and_is_reasonable():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    fn = jax.jit(lambda b, k: T.device_augment(b, k, dtype=jnp.float32))
    out = np.asarray(fn(batch, key))
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(out).all()
    # different keys → different augmentations; same key → identical
    out2 = np.asarray(fn(batch, jax.random.PRNGKey(1)))
    assert not np.allclose(out, out2)
    np.testing.assert_array_equal(out, np.asarray(fn(batch, key)))


def test_device_augment_zero_strength_equals_prepare():
    batch = np.random.default_rng(1).integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    aug = T.device_augment(batch, key, dtype=jnp.float32, jitter=0.0, lighting=0.0)
    ref = T.device_prepare(batch, dtype=jnp.float32)
    # only the flip can differ; undo by comparing against both orientations
    a, r = np.asarray(aug), np.asarray(ref)
    flipped = r[:, :, ::-1, :]
    for i in range(2):
        assert np.allclose(a[i], r[i], atol=1e-5) or np.allclose(
            a[i], flipped[i], atol=1e-5
        )


class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((4, 4, 3), i, np.uint8), i % 3, i


def test_loader_batches_and_shuffle_determinism():
    ds = _RangeDataset(10)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    batches_a = [b[2].tolist() for b in dl]
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, seed=1, num_workers=2)
    batches_b = [b[2].tolist() for b in dl2]
    assert batches_a == batches_b
    assert sorted(sum(batches_a, [])) == list(range(10))
    assert len(dl) == 3
    imgs, labels, idx = next(iter(dl))
    assert imgs.shape == (4, 4, 4, 3) and labels.shape == (4,)


def test_loader_epoch_reshuffles():
    ds = _RangeDataset(16)
    dl = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    first = next(iter(dl))[2].tolist()
    dl.set_epoch(1)
    second = next(iter(dl))[2].tolist()
    assert first != second
    assert sorted(first) == sorted(second)


def test_loader_sharding_disjoint_and_complete():
    ds = _RangeDataset(12)
    seen = []
    for shard in range(3):
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=3, num_shards=3,
                        shard_id=shard)
        seen.append(sum((b[2].tolist() for b in dl), []))
    flat = sum(seen, [])
    assert sorted(flat) == list(range(12))
    assert len(set(seen[0]) & set(seen[1])) == 0


def test_loader_shards_equal_batch_counts():
    """Uneven dataset sizes must still give every shard the SAME batch count
    (multi-host collectives run in lockstep; unequal counts deadlock). The pad
    wraps the permutation, so some samples repeat — coverage stays complete."""
    ds = _RangeDataset(31)
    loaders = [DataLoader(ds, batch_size=8, shuffle=True, seed=5, num_shards=2,
                          shard_id=s) for s in range(2)]
    counts = [sum(1 for _ in dl) for dl in loaders]
    assert counts[0] == counts[1] == len(loaders[0]) == len(loaders[1])
    seen = set()
    for dl in loaders:
        for b in dl:
            seen.update(b[2].tolist())
    assert seen == set(range(31))


def test_loader_drop_last():
    ds = _RangeDataset(10)
    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(dl) == 2
    assert sum(1 for _ in dl) == 2


def test_prefetch_to_device_sharded():
    mesh = make_mesh()
    ds = _RangeDataset(16)
    dl = DataLoader(ds, batch_size=8)
    out = list(prefetch_to_device(iter(dl), batch_sharding(mesh)))
    assert len(out) == 2
    assert out[0][0].sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(out[0][2]), np.arange(8))


def test_prefetch_stats_accounting():
    """The optional stats dict must accumulate the overlap-attribution legs
    (source wait / device_put / queue-full) and the batch count."""
    stats = {}
    batches = [np.full(4, i, np.float32) for i in range(5)]
    out = list(prefetch_to_device(iter(batches), stats=stats))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[3]), batches[3])
    assert stats["batches"] == 5
    for k in ("source_s", "device_put_s", "queue_full_s"):
        assert stats[k] >= 0.0


def test_prefetch_decode_overlaps_transfer():
    """Two-stage pipeline: batch k+1's source pull must proceed WHILE batch
    k's device_put runs (a serial producer pays source+put per batch). With
    source=put=d per item, serial is ~2*N*d; pipelined is ~N*d."""
    import time

    d = 0.05
    n = 6

    def slow_source():
        for i in range(n):
            time.sleep(d)
            yield np.full(2, i, np.float32)

    class SlowPutSharding:
        pass

    # patch the put leg via a transform-free path: wrap device_put with a sleep
    from tennis_tpu.data import loader as L

    orig = L.jnp_device_put_default

    def slow_put(x):
        time.sleep(d)
        return orig(x)

    L.jnp_device_put_default = slow_put
    try:
        tic = time.perf_counter()
        out = list(prefetch_to_device(slow_source(), buffer_size=2))
        wall = time.perf_counter() - tic
    finally:
        L.jnp_device_put_default = orig
    assert len(out) == n
    # serial would be >= 2*n*d = 0.6 s; allow generous slack for a loaded box
    assert wall < 1.7 * n * d, f"no decode/transfer overlap: wall={wall:.3f}s"


def test_prefetch_propagates_errors():
    def bad_iter():
        yield (np.zeros(4),)
        raise RuntimeError("boom")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_padded_batch():
    arrays = [np.ones((2, 3)), np.ones((5, 3)), np.ones((1, 3))]
    stacked, lengths = padded_batch(arrays)
    assert stacked.shape == (3, 5, 3)
    np.testing.assert_array_equal(lengths, [2, 5, 1])
    assert stacked[0, 2:].sum() == 0


def test_color_jitter_affine_matches_sequential():
    """The fused affine composition must equal naively applying the three jitter
    ops one after another, for every one of the six orders."""
    rng = np.random.default_rng(7)
    B = 6
    x = rng.uniform(0, 1, (B, 5, 4, 3)).astype(np.float32)
    fb = 1.0 + rng.uniform(-0.4, 0.4, B).astype(np.float32)
    fc = 1.0 + rng.uniform(-0.4, 0.4, B).astype(np.float32)
    fs = 1.0 + rng.uniform(-0.4, 0.4, B).astype(np.float32)

    def brightness(img, i):
        return fb[i] * img

    def contrast(img, i):
        luma = np.asarray(T.luma_of(img))
        return fc[i] * img + (1 - fc[i]) * luma.mean()

    def saturation(img, i):
        return fs[i] * img + (1 - fs[i]) * np.asarray(T.luma_of(img))

    from itertools import permutations

    ops = (brightness, contrast, saturation)
    orders = list(permutations(range(3)))
    # sample i uses order i — covers all six orders
    order = np.arange(B, dtype=np.int32)
    luma = np.asarray(T.luma_of(x))
    a, b, s = T.color_jitter_coeffs(
        jnp.asarray(fb), jnp.asarray(fc), jnp.asarray(fs),
        jnp.asarray(luma.mean(axis=(1, 2, 3))), jnp.asarray(order),
    )
    fused = (np.asarray(a)[:, None, None, None] * x
             + np.asarray(b)[:, None, None, None] * luma
             + np.asarray(s)[:, None, None, None])

    for i in range(B):
        img = x[i]
        for op_i in orders[i]:
            img = ops[op_i](img, i)
        np.testing.assert_allclose(fused[i], img, rtol=1e-4, atol=1e-5)


def test_device_augment_uses_random_order():
    """With contrast+saturation active, different orders give different images —
    check the per-sample order stream actually varies the output."""
    batch = np.random.default_rng(2).integers(0, 255, (8, 8, 8, 3), dtype=np.uint8)
    outs = [np.asarray(T.device_augment(batch, jax.random.PRNGKey(k),
                                        dtype=jnp.float32)) for k in range(3)]
    assert not np.allclose(outs[0], outs[1]) and not np.allclose(outs[1], outs[2])


def test_prefetch_producer_exits_on_abandoned_consumer():
    """Breaking out of the consume loop must release the producer thread (it
    used to block forever on the full queue, pinning device-resident batches
    for process life)."""
    import threading

    import numpy as np

    from tennis_tpu.data.loader import prefetch_to_device

    before = set(threading.enumerate())
    it = prefetch_to_device(iter([np.zeros(4, np.float32)] * 50),
                            buffer_size=1)
    next(it)  # pipeline running, queues full
    new = [t for t in threading.enumerate() if t not in before]
    assert len(new) == 2  # source + transfer stages
    it.close()  # abandon the generator early
    for t in new:
        t.join(timeout=10)
        assert not t.is_alive()
