"""Data layer: TenniSet index, vocabulary, transforms, batching, video tooling."""

from tennis_tpu.data.vocab import Vocab
from tennis_tpu.data.tennis_set import TennisSet

__all__ = ["Vocab", "TennisSet"]
