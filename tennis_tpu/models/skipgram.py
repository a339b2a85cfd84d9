"""FastText-style SkipGram with subword n-gram hashing and negative sampling.

TPU-native rebuild of the reference's embedding model (reference
utils/embeddings/model.py:97-144 ``SG``, :147-236 ``UnigramCandidateSampler``; the
gluon-nlp word_embeddings script family):

- subword units are fastText FNV-1a n-gram hashes (ngrams 3-6, 100 buckets),
  reproducing gluonnlp's ``NGramHashes``;
- the reference represents a center word as a sparse CSR row over
  word+subword units (MXNet ``sparse.dot``). On TPU the same computation is a
  **padded dense gather**: each vocab entry has a fixed-width subword-index row
  (pad = a zero-weight slot), so a batch lookup is one gather + weighted mean —
  static shapes, no sparse kernels;
- negatives come from a unigram^0.75 alias table (host-built, reference
  :176-207) sampled on device with jax PRNG;
- the loss is the reference's masked binary-logistic pair loss (:120-144),
  expressed as softplus identities.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------- subword hashing


def fasttext_hash(s: str) -> int:
    """FNV-1a 32-bit over the UTF-8 bytes (fastText's ngram hash)."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def word_ngram_hashes(word: str, ngrams: Sequence[int], num_buckets: int):
    """Subword hash ids of '<word>' for each n in ``ngrams`` (gluonnlp
    ``NGramHashes`` semantics)."""
    token = f"<{word}>"
    out = []
    for n in ngrams:
        for i in range(len(token) - n + 1):
            out.append(fasttext_hash(token[i : i + n]) % num_buckets)
    return out


def build_subword_table(idx_to_token, ngrams=(3, 4, 5, 6), num_buckets=100):
    """Padded (V, 1+max_sub) unit-index table + (V, 1+max_sub) weights.

    Row v = [v, subword ids (+V offset)...]; weights = 1/(1+n_sub) on real slots,
    0 on padding — the dense-equivalent of the reference's CSR center rows
    (utils/embeddings/data.py:191-240).
    """
    subs = [word_ngram_hashes(t, ngrams, num_buckets) for t in idx_to_token]
    V = len(idx_to_token)
    width = 1 + max((len(s) for s in subs), default=0)
    idx = np.zeros((V, width), np.int32)
    w = np.zeros((V, width), np.float32)
    for v, s in enumerate(subs):
        weight = 1.0 / (1 + len(s))
        idx[v, 0] = v
        w[v, 0] = weight
        for j, u in enumerate(s):
            idx[v, 1 + j] = V + u
            w[v, 1 + j] = weight
    return idx, w


# --------------------------------------------------------------- alias sampling


def build_alias_table(weights, smoothing: float = 0.75):
    """Walker alias tables (prob, alias) for unigram^smoothing sampling
    (reference utils/embeddings/model.py:176-207)."""
    weights = np.asarray(weights, np.float64) ** smoothing
    N = len(weights)
    prob = (weights * N / weights.sum()).tolist()
    alias = [0] * N
    low = [i for i in range(N) if prob[i] < 1.0]
    high = [i for i in range(N) if prob[i] >= 1.0]
    while low and high:
        l, h = low.pop(), high.pop()
        alias[l] = h
        prob[h] -= 1.0 - prob[l]
        (low if prob[h] < 1.0 else high).append(h)
    for i in low + high:
        prob[i] = 1.0
        alias[i] = i
    return np.asarray(prob, np.float32), np.asarray(alias, np.int32)


def alias_sample(key, prob, alias, shape):
    """Draw ``shape`` class ids from the alias tables on device."""
    N = prob.shape[0]
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, shape, 0, N)
    accept = jax.random.uniform(k2, shape) < prob[idx]
    return jnp.where(accept, idx, alias[idx])


# --------------------------------------------------------------------- the model


class SkipGram:
    """Parameter container + pure functions (the model is two embedding tables)."""

    def __init__(self, vocab_size: int, num_buckets: int, emb_size: int,
                 counts, ngrams=(3, 4, 5, 6), num_negatives: int = 3,
                 smoothing: float = 0.75, idx_to_token=None):
        self.vocab_size = vocab_size
        self.num_units = vocab_size + num_buckets
        self.emb_size = emb_size
        self.num_negatives = num_negatives
        sub_idx, sub_w = build_subword_table(
            idx_to_token if idx_to_token is not None
            else [str(i) for i in range(vocab_size)],
            ngrams, num_buckets,
        )
        self.subword_idx = jnp.asarray(sub_idx)
        self.subword_w = jnp.asarray(sub_w)
        prob, alias = build_alias_table(counts, smoothing)
        self.alias_prob = jnp.asarray(prob)
        self.alias_alias = jnp.asarray(alias)

    def init_params(self, rng):
        k = jax.random.uniform(
            rng, (self.num_units, self.emb_size),
            minval=-1.0 / self.emb_size, maxval=1.0 / self.emb_size,
        )
        return {
            "embedding": k,  # input embedding over word+subword units
            "embedding_out": jnp.zeros((self.vocab_size, self.emb_size)),
        }

    def embed_words(self, params, word_ids):
        """Mean-of-units center embedding (word + its subword hashes)."""
        units = self.subword_idx[word_ids]          # (B, W)
        weights = self.subword_w[word_ids]          # (B, W)
        vecs = params["embedding"][units]           # (B, W, D)
        return jnp.einsum("bw,bwd->bd", weights, vecs)

    def loss(self, params, center, context, key):
        """Reference SG loss (utils/embeddings/model.py:120-144): positive pair
        softplus(-x), negatives softplus(x) masked where the negative collides
        with the center or context, both normalized by (mask_sum + 1)."""
        B = center.shape[0]
        negatives = alias_sample(key, self.alias_prob, self.alias_alias,
                                 (B, self.num_negatives))
        mask = (negatives != center[:, None]) & (negatives != context[:, None])
        mask = mask.astype(jnp.float32)

        emb_center = self.embed_words(params, center)          # (B, D)
        emb_context = params["embedding_out"][context]         # (B, D)
        pred_pos = jnp.sum(emb_center * emb_context, axis=-1)  # (B,)
        loss_pos = jax.nn.softplus(-pred_pos) / (mask.sum(axis=1) + 1)

        emb_neg = params["embedding_out"][negatives]           # (B, K, D)
        pred_neg = jnp.einsum("bd,bkd->bk", emb_center, emb_neg)
        loss_neg = (jax.nn.softplus(pred_neg) * mask).sum(axis=1) / (
            mask.sum(axis=1) + 1
        )
        return loss_pos + loss_neg

    def token_vectors(self, params):
        """Row-normalized per-token vectors, as exported by the reference
        (train_embeddings.py:80-84,135-145)."""
        vecs = self.embed_words(params, jnp.arange(self.vocab_size))
        norm = jnp.sqrt(jnp.sum(vecs * vecs, axis=1) + 1e-10)
        return vecs / norm[:, None]
