"""Compute ops: scan RNNs, attention, beam search, fused image ops, Pallas kernels."""

from tennis_tpu.ops.rnn import GRUCell, LSTMCell, unroll_rnn, BiRNN, StackedRNN
from tennis_tpu.ops.masking import sequence_mask, reverse_sequence

__all__ = [
    "GRUCell",
    "LSTMCell",
    "unroll_rnn",
    "BiRNN",
    "StackedRNN",
    "sequence_mask",
    "reverse_sequence",
]
