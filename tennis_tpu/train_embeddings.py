"""SkipGram word-embedding trainer (reference train_embeddings.py:1-168).

Corpus = ``captions.txt`` (+ the 10,817-line extra corpus when present), vocab with
no special tokens, fastText SkipGram (ngrams 3-6, 100 buckets, 3 negatives,
smoothing 0.75), AdaGrad lr=0.05, 2 epochs, window 3, batch 32. Exports
``embeddings-ex.txt`` in the exact reference format (token + row-normalized
vector per line), prints a k-NN probe, and writes the t-SNE scatter export.

Host-side pair generation uses the native C++ batch ops
(tennis_tpu/native/batch_ops.cpp), the compiled replacement for the reference's
numba kernels.

Run: ``python -m tennis_tpu.train_embeddings --root data``
"""
from __future__ import annotations

import os
import sys
import time
from collections import Counter

import numpy as np
from absl import flags, logging

from tennis_tpu.utils import print_time

FLAGS = flags.FlagValues()
flags.DEFINE_string("root", "data", "dataset root", flag_values=FLAGS)
flags.DEFINE_bool("add_extra", True, "include the extra captions corpus",
                  flag_values=FLAGS)
flags.DEFINE_integer("batch_size", 32, "batch size", flag_values=FLAGS)
flags.DEFINE_integer("emb_size", 100, "embedding dim", flag_values=FLAGS)
flags.DEFINE_integer("epochs", 2, "epochs", flag_values=FLAGS)
flags.DEFINE_integer("window", 3, "context window", flag_values=FLAGS)
flags.DEFINE_integer("num_negatives", 3, "negatives per pair", flag_values=FLAGS)
flags.DEFINE_integer("ngram_buckets", 100, "subword hash buckets",
                     flag_values=FLAGS)
flags.DEFINE_float("lr", 0.05, "adagrad learning rate", flag_values=FLAGS)
flags.DEFINE_bool("overwrite", False, "overwrite existing embedding file",
                  flag_values=FLAGS)
flags.DEFINE_integer("log_interval", 500, "log every N batches",
                     flag_values=FLAGS)
flags.DEFINE_integer("seed", 0, "rng seed", flag_values=FLAGS)
flags.DEFINE_string("probe_word", "hits", "k-NN probe word", flag_values=FLAGS)
flags.DEFINE_bool("tsne", True, "write the t-SNE visualisation export",
                  flag_values=FLAGS)


def load_corpus(root: str, add_extra: bool):
    """Caption token lists, dropping the leading point-id column
    (reference train_embeddings.py:31-39)."""
    paths = [os.path.join(root, "annotations", "captions.txt")]
    if add_extra:
        extra = os.path.join(root, "annotations", "captions_extra_001-045.txt")
        if os.path.exists(extra):
            paths.append(extra)
        else:
            logging.warning("extra corpus %s not found", extra)
    lines = []
    for path in paths:
        with open(path, "r", encoding="utf-8") as f:
            lines += [line.rstrip().split()[1:] for line in f if line.strip()]
    return lines


class EmbeddingVocab:
    """Frequency-sorted vocab with NO special tokens (reference
    train_embeddings.py:43-44 uses gluonnlp.Vocab with all specials=None)."""

    def __init__(self, counter: Counter):
        items = sorted(counter.items(), key=lambda kv: kv[0])
        items.sort(key=lambda kv: kv[1], reverse=True)
        self.idx_to_token = [t for t, _ in items]
        self.token_to_idx = {t: i for i, t in enumerate(self.idx_to_token)}
        self.idx_to_counts = [c for _, c in items]

    def __len__(self):
        return len(self.idx_to_token)

    def __contains__(self, t):
        return t in self.token_to_idx

    def __getitem__(self, t):
        return self.token_to_idx[t]


def k_closest_tokens(vocab, vecs, word: str, k: int = 10):
    """Cosine k-NN probe (reference train_embeddings.py:83-97)."""
    vecs = np.asarray(vecs)
    unit = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-10)
    sims = unit @ unit[vocab[word]]
    order = np.argsort(-sims)
    return [vocab.idx_to_token[i] for i in order[1 : k + 1]]


def train(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from tennis_tpu.models.skipgram import SkipGram
    from tennis_tpu.native import HAVE_NATIVE, center_context_pairs

    sentences = load_corpus(FLAGS.root, FLAGS.add_extra)
    counter = Counter(t for s in sentences for t in s)
    vocab = EmbeddingVocab(counter)
    coded = [[vocab[t] for t in s if t in vocab] for s in sentences]
    logging.info("# sentences: %d, vocab: %d, native batch ops: %s",
                 len(sentences), len(vocab), HAVE_NATIVE)

    model = SkipGram(
        vocab_size=len(vocab), num_buckets=FLAGS.ngram_buckets,
        emb_size=FLAGS.emb_size, counts=vocab.idx_to_counts,
        num_negatives=FLAGS.num_negatives, idx_to_token=vocab.idx_to_token,
    )
    rng = jax.random.PRNGKey(FLAGS.seed)
    params = model.init_params(rng)
    tx = optax.adagrad(FLAGS.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, center, context, key):
        def loss_fn(p):
            return model.loss(p, center, context, key).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    B = FLAGS.batch_size
    key = jax.random.PRNGKey(FLAGS.seed + 1)
    for epoch in range(1, FLAGS.epochs + 1):
        # reference wraps its batch prep in print_time('prepare subwords')
        # (utils/embeddings/data.py:97); same timing surface here
        with print_time(f"prepare pairs (epoch {epoch})"):
            centers, contexts = center_context_pairs(coded, FLAGS.window,
                                                     seed=FLAGS.seed + epoch)
        perm = np.random.default_rng(FLAGS.seed + epoch).permutation(len(centers))
        centers, contexts = centers[perm], contexts[perm]
        n_batches = len(centers) // B
        tic = time.time()
        loss_sum, word_count = 0.0, 0
        logging.info("epoch %d: %d pairs, %d batches", epoch, len(centers),
                     n_batches)
        for i in range(n_batches):
            c = jnp.asarray(centers[i * B : (i + 1) * B])
            x = jnp.asarray(contexts[i * B : (i + 1) * B])
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, c, x, sub)
            loss_sum += float(loss)
            word_count += B
            if i % FLAGS.log_interval == 0 and i > 0:
                wps = word_count / (time.time() - tic)
                logging.info("epoch %d, iter %d, loss %.2f, %.2fK wps",
                             epoch, i, loss_sum / FLAGS.log_interval, wps / 1000)
                tic, loss_sum, word_count = time.time(), 0.0, 0

        vecs = np.asarray(model.token_vectors(params))
        if FLAGS.probe_word in vocab:
            logging.info('closest tokens to "%s": %s', FLAGS.probe_word,
                         ", ".join(k_closest_tokens(vocab, vecs,
                                                    FLAGS.probe_word)))

    # export (reference train_embeddings.py:135-145 format)
    vecs = np.asarray(model.token_vectors(params))
    name = "embeddings-ex.txt" if FLAGS.add_extra else "embeddings.txt"
    save_path = os.path.join(FLAGS.root, name)
    if FLAGS.overwrite or not os.path.exists(save_path):
        with open(save_path, "w", encoding="utf-8") as f:
            for i, word in enumerate(vocab.idx_to_token):
                f.write("%s %s\n" % (word, " ".join(str(x) for x in vecs[i])))
        logging.info("wrote %s", save_path)

    if FLAGS.tsne:
        try:
            from sklearn.manifold import TSNE

            perplexity = min(40, max(2, len(vocab) - 1))
            pts = TSNE(n_components=2, perplexity=perplexity,
                       init="random").fit_transform(vecs)
            with open(os.path.join(FLAGS.root, "embs-for-vis.txt"), "w") as f:
                f.write('"word","x","y"\n')
                for i, t in enumerate(vocab.idx_to_token):
                    f.write('"%s",%f,%f\n' % (t, pts[i, 0], pts[i, 1]))
        except Exception as e:  # sklearn optional
            logging.warning("t-SNE export skipped: %s", e)

    return params, vocab, vecs


def main(argv=None):
    FLAGS(argv if argv is not None else sys.argv)
    return train()


if __name__ == "__main__":
    main()
