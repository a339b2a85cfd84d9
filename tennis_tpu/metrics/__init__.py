"""Metric suite: per-class P/R/F1 + confusion matrix, accuracy variants, corpus BLEU,
and the NLG caption metrics (BLEU-n, ROUGE-L, METEOR-lite, CIDEr)."""

from tennis_tpu.metrics.vision import PRF1, confusion_matrix, prf1_from_confusion
from tennis_tpu.metrics.accuracy import Accuracy, TopKAccuracy
from tennis_tpu.metrics.bleu import compute_bleu

__all__ = [
    "PRF1",
    "confusion_matrix",
    "prf1_from_confusion",
    "Accuracy",
    "TopKAccuracy",
    "compute_bleu",
]
