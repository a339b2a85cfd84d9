"""Tennis-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for dense tennis-event
recognition and commentary generation, with the capabilities of HaydenFaulkner/Tennis.

Subpackages
-----------
- ``tennis_tpu.data``      — TenniSet dataset index, vocab, transforms, loaders, video IO
- ``tennis_tpu.models``    — backbones (DenseNet/ResNet/R(2+1)D/FlowNet), frame/temporal
                             classifiers, GNMT captioner, SkipGram embeddings
- ``tennis_tpu.ops``       — scan RNN cells, Luong attention, batched beam search,
                             fused image ops, Pallas kernels
- ``tennis_tpu.parallel``  — device mesh, sharding rules, jitted train-step harness
- ``tennis_tpu.metrics``   — per-class P/R/F1, accuracy variants, corpus BLEU, NLG suite
- ``tennis_tpu.utils``     — checkpointing, experiment dirs, logging, visualisation
"""

__version__ = "0.1.0"
