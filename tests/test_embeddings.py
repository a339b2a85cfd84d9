import os
from collections import Counter

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.models.skipgram import (
    SkipGram,
    alias_sample,
    build_alias_table,
    build_subword_table,
    fasttext_hash,
    word_ngram_hashes,
)
from tennis_tpu.native import (
    HAVE_NATIVE,
    _center_context_pairs_np,
    _skipgram_lookup_np,
    center_context_pairs,
    skipgram_lookup,
)


def test_fasttext_hash_is_fnv1a():
    # FNV-1a 32-bit known value: empty string hashes to the offset basis
    assert fasttext_hash("") == 2166136261
    # 'a' → (2166136261 ^ 97) * 16777619 mod 2^32
    assert fasttext_hash("a") == ((2166136261 ^ 97) * 16777619) % 2**32


def test_word_ngram_hashes_counts():
    hashes = word_ngram_hashes("cat", [3, 4, 5], 100)
    # '<cat>' has length 5: 3 trigrams + 2 fourgrams + 1 fivegram
    assert len(hashes) == 6
    assert all(0 <= h < 100 for h in hashes)


def test_subword_table_weights():
    idx, w = build_subword_table(["hi", "cat"], ngrams=(3,), num_buckets=50)
    # '<hi>' has 2 trigrams; row = [word, s1, s2]; weights 1/3
    assert idx.shape[1] >= 3
    np.testing.assert_allclose(w[0, :3], 1 / 3, rtol=1e-6)
    assert idx[0, 0] == 0 and (idx[0, 1:3] >= 2).all()  # subwords offset by V


def test_alias_table_distribution():
    counts = np.array([100, 10, 1])
    prob, alias = build_alias_table(counts, smoothing=0.75)
    key = jax.random.PRNGKey(0)
    samples = np.asarray(
        alias_sample(key, jnp.asarray(prob), jnp.asarray(alias), (20000,))
    )
    freq = np.bincount(samples, minlength=3) / 20000
    expected = counts**0.75 / (counts**0.75).sum()
    np.testing.assert_allclose(freq, expected, atol=0.02)


def test_skipgram_lookup_native_matches_numpy():
    subwordidxs = np.array([5, 7, 9, 11], np.int64)
    subwordidxsptr = np.array([0, 2, 4], np.int64)  # word0: [5,7], word1: [9,11]
    indices = np.array([1, 0, 0], np.int64)
    got = skipgram_lookup(indices, subwordidxs, subwordidxsptr, offset=2)
    ref = _skipgram_lookup_np(indices, subwordidxs, subwordidxsptr, 2)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r)
    data, row, col = got
    # row 0 is word 1: entries (1, 9+2, 11+2) weighted 1/3
    assert col[0] == 1 and col[1] == 11 and col[2] == 13
    np.testing.assert_allclose(data[:3], 1 / 3, rtol=1e-6)


def test_center_context_pairs_native_matches_semantics():
    sents = [[0, 1, 2, 3], [4, 5]]
    centers, contexts = center_context_pairs(sents, window=2, seed=3)
    assert len(centers) == len(contexts) > 0
    # every pair comes from the same sentence and is within the max window
    pos = {i: t for s in sents for t, i in enumerate(s)}  # token → position
    sent_of = {i: si for si, s in enumerate(sents) for i in s}
    for c, x in zip(centers, contexts):
        assert sent_of[int(c)] == sent_of[int(x)]
        assert 1 <= abs(pos[int(c)] - pos[int(x)]) <= 2
    # deterministic for a fixed seed
    again = center_context_pairs(sents, window=2, seed=3)
    np.testing.assert_array_equal(centers, again[0])


def test_native_compiled():
    # the environment ships g++, so the compiled path must be active
    assert HAVE_NATIVE


def test_skipgram_model_learns():
    import optax

    # toy corpus: two "topics" — words 0-3 co-occur, words 4-7 co-occur
    rng = np.random.default_rng(0)
    sents = []
    for _ in range(200):
        base = 0 if rng.uniform() < 0.5 else 4
        sents.append(list(base + rng.integers(0, 4, size=6)))

    vocab = [f"w{i}" for i in range(8)]
    counts = np.bincount([t for s in sents for t in s], minlength=8)
    model = SkipGram(8, num_buckets=20, emb_size=16, counts=counts,
                     idx_to_token=vocab, num_negatives=3)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adagrad(0.1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, c, x, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, c, x, key).mean()
        )(params)
        u, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, u), opt_state, loss

    centers, contexts = center_context_pairs(sents, window=3, seed=0)
    key = jax.random.PRNGKey(1)
    B = 64
    first = last = None
    for i in range(len(centers) // B):
        c = jnp.asarray(centers[i * B : (i + 1) * B])
        x = jnp.asarray(contexts[i * B : (i + 1) * B])
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, c, x, sub)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first

    # within-topic similarity should exceed across-topic
    vecs = np.asarray(model.token_vectors(params))
    within = np.mean([vecs[i] @ vecs[j] for i in range(4) for j in range(4)
                      if i != j])
    across = np.mean([vecs[i] @ vecs[j] for i in range(4) for j in range(4, 8)])
    assert within > across


def test_train_embeddings_driver(tmp_path):
    # build a mini corpus in the reference's file format
    root = tmp_path / "data"
    os.makedirs(root / "annotations")
    caps = [
        "p1\tplayer serves an ace",
        "p2\tplayer hits a winner",
        "p3\tplayer serves into the net",
        "p4\tthe player hits a forehand",
    ]
    # the loader splits on whitespace and drops column 0
    with open(root / "annotations" / "captions.txt", "w") as f:
        f.write("\n".join(c.replace("\t", " ") for c in caps) + "\n")

    from tennis_tpu.train_embeddings import main

    params, vocab, vecs = main([
        "train_embeddings.py", f"--root={root}", "--epochs=1", "--emb_size=8",
        "--batch_size=4", "--noadd_extra", "--probe_word=player",
        "--notsne", "--overwrite",
    ])
    out = root / "embeddings.txt"
    assert out.exists()
    lines = out.read_text().strip().splitlines()
    assert len(lines) == len(vocab)
    first = lines[0].split()
    assert first[0] == "player"  # most frequent token first
    assert len(first) == 1 + 8
    # exported vectors are row-normalized
    v = np.asarray([float(x) for x in first[1:]])
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-3)
