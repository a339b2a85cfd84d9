"""Pallas TPU kernels for the framework's hot ops."""

from tennis_tpu.ops.pallas.gru import gru_sequence_pallas

__all__ = ["gru_sequence_pallas"]
