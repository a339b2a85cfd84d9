"""Token vocabulary, index-compatible with gluonnlp's ``Vocab``.

The reference builds its caption vocabulary with ``gluonnlp.Vocab(counter)``
(reference dataset.py:58-59) whose default layout is:

    0: '<unk>'   1: '<pad>'   2: '<bos>'   3: '<eos>'   then corpus tokens

with corpus tokens ordered by descending frequency, ties broken alphabetically.
Checkpoint/caption-id compatibility depends on reproducing that exact ordering.
"""
from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence


class Vocab:
    UNK = "<unk>"
    PAD = "<pad>"
    BOS = "<bos>"
    EOS = "<eos>"

    def __init__(
        self,
        counter: Counter | None = None,
        max_size: int | None = None,
        min_freq: int = 1,
    ):
        self.unknown_token = self.UNK
        self.padding_token = self.PAD
        self.bos_token = self.BOS
        self.eos_token = self.EOS
        self.idx_to_token: list[str] = [self.UNK, self.PAD, self.BOS, self.EOS]
        if counter:
            # alphabetical first, then stable sort by freq desc → gluonnlp ordering
            items = sorted(counter.items(), key=lambda kv: kv[0])
            items.sort(key=lambda kv: kv[1], reverse=True)
            for token, freq in items:
                if freq < min_freq:
                    continue
                if max_size is not None and len(self.idx_to_token) >= max_size + 4:
                    break
                if token not in (self.UNK, self.PAD, self.BOS, self.EOS):
                    self.idx_to_token.append(token)
        self.token_to_idx = {t: i for i, t in enumerate(self.idx_to_token)}

    @classmethod
    def from_tokens(cls, tokens: Iterable[str], **kwargs) -> "Vocab":
        return cls(Counter(tokens), **kwargs)

    def __len__(self) -> int:
        return len(self.idx_to_token)

    def __contains__(self, token: str) -> bool:
        return token in self.token_to_idx

    def to_indices(self, tokens):
        if isinstance(tokens, str):
            return self.token_to_idx.get(tokens, self.token_to_idx[self.UNK])
        return [self.token_to_idx.get(t, self.token_to_idx[self.UNK]) for t in tokens]

    def to_tokens(self, indices):
        if isinstance(indices, int):
            return self.idx_to_token[indices]
        return [self.idx_to_token[int(i)] for i in indices]

    def __getitem__(self, tokens):
        return self.to_indices(tokens)

    def __repr__(self):
        return f"Vocab(size={len(self)}, unk='{self.UNK}')"


def load_embeddings(path: str, vocab: Vocab, emb_dim: int | None = None):
    """Load a ``embeddings-ex.txt``-style file (``token v0 v1 ...`` per line; format
    written by reference train_embeddings.py:143-145) into a (len(vocab), D) matrix.

    Tokens absent from the file get zero vectors (gluonnlp ``TokenEmbedding`` default).
    """
    import numpy as np

    table = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split()
            if len(parts) < 2:
                continue
            token, vec = parts[0], np.asarray(parts[1:], dtype=np.float32)
            table[token] = vec
            if emb_dim is None:
                emb_dim = len(vec)
    assert emb_dim is not None, f"no embeddings parsed from {path}"
    out = np.zeros((len(vocab), emb_dim), dtype=np.float32)
    for token, vec in table.items():
        if token in vocab:
            out[vocab[token]] = vec
    return out


def captions_vocab(captions: Sequence[str]) -> Vocab:
    """Vocabulary over whitespace-tokenized caption strings (reference dataset.py:55-59)."""
    words = " ".join(captions).split()
    return Vocab(Counter(words))
