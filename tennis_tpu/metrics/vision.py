"""Per-class precision / recall / F1 with confusion matrix.

Replaces the reference's ``metrics/vision.py`` (PRF1, reference metrics/vision.py:8-99).
The accumulator state is a single (C, C) confusion matrix, from which everything else is
derived — unlike the reference, which keeps three running score rows, the confusion
matrix is sufficient and allows jit-friendly batched updates via one scatter-add.

Naming note (documented behaviour change): the reference computes
``prec = matches / positives`` and ``rec = matches / predictions``
(reference metrics/vision.py:73-74), i.e. the two names are *swapped* relative to the
standard definitions. F1 — including the published model-selection score ``AVG_NB_f1``
(reference train.py:487-489) — is symmetric in the two, so it is numerically identical
here. This module uses the standard definitions: precision = TP / predicted-positives,
recall = TP / actual-positives.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_EPS = float(np.finfo(np.float64).eps)


def confusion_matrix(labels, preds, num_classes: int):
    """Batched confusion matrix as a jit-friendly scatter-add.

    Args:
        labels: int array of true class indices, any shape.
        preds:  int array of predicted class indices (same shape), or an array with one
            trailing logit/probability axis of size ``num_classes`` (argmax is taken).
        num_classes: number of classes C.

    Returns:
        (C, C) float32 matrix with ``mat[true, pred]`` counts.
    """
    labels = jnp.asarray(labels)
    preds = jnp.asarray(preds)
    if preds.shape != labels.shape:
        preds = jnp.argmax(preds, axis=-1)
    labels = labels.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    flat = labels * num_classes + preds
    counts = jnp.zeros((num_classes * num_classes,), jnp.float32).at[flat].add(1.0)
    return counts.reshape(num_classes, num_classes)


def prf1_from_confusion(mat):
    """Derive per-class (precision, recall, f1) arrays from a (C, C) confusion matrix."""
    mat = np.asarray(mat, dtype=np.float64)
    tp = np.diag(mat)
    actual = mat.sum(axis=1)  # row = true class
    predicted = mat.sum(axis=0)  # col = predicted class
    prec = tp / (predicted + _EPS)
    rec = tp / (actual + _EPS)
    f1 = 2.0 * prec * rec / (prec + rec + _EPS)
    return prec, rec, f1


class PRF1:
    """Streaming per-class P/R/F1 metric with the reference's ``update/get/reset``
    protocol and score-name surface (``<class>_prec/_rec/_f1``, ``AVG_*``, ``AVG_NB_*``;
    reference metrics/vision.py:60-92). ``AVG_NB_*`` excludes class 0 (background/OTH).
    """

    def __init__(self, label_names):
        self.label_names = list(label_names)
        self.num_classes = len(self.label_names)
        self.reset()

    def reset(self):
        self.mat = np.zeros((self.num_classes, self.num_classes), dtype=np.float64)

    def update(self, labels, preds):
        """Accumulate a batch. ``labels`` int (N,), ``preds`` int (N,) or (N, C)."""
        batch = confusion_matrix(labels, preds, self.num_classes)
        self.mat += np.asarray(jax.device_get(batch), dtype=np.float64)

    def update_confusion(self, mat):
        """Accumulate a precomputed (C, C) confusion matrix (e.g. from a jitted eval)."""
        self.mat += np.asarray(jax.device_get(mat), dtype=np.float64)

    def get(self):
        """Returns a list of (name, value) tuples, mirroring the reference layout."""
        prec, rec, f1 = prf1_from_confusion(self.mat)
        scores = []
        for i, c in enumerate(self.label_names):
            scores.append((c + "_prec", float(prec[i])))
            scores.append((c + "_rec", float(rec[i])))
            scores.append((c + "_f1", float(f1[i])))
        scores.append(("AVG_prec", float(prec.mean())))
        scores.append(("AVG_rec", float(rec.mean())))
        scores.append(("AVG_f1", float(f1.mean())))
        scores.append(("AVG_NB_prec", float(prec[1:].mean())))
        scores.append(("AVG_NB_rec", float(rec[1:].mean())))
        scores.append(("AVG_NB_f1", float(f1[1:].mean())))
        return scores

    def get_dict(self):
        return dict(self.get())

    def confusion_str(self) -> str:
        """Tab-separated confusion matrix string (reference train.py:362-367 surface)."""
        lines = ["\t" + "\t".join(self.label_names)]
        for i, c in enumerate(self.label_names):
            lines.append(c + "\t" + "\t".join(str(int(v)) for v in self.mat[i]))
        return "\n".join(lines)
