"""Beam-search translator: model wrapper around the jitted batched beam search.

Surface-compatible with the reference's ``BeamSearchTranslator.translate``
(reference utils/translation.py:28-82): encode → init decoder state → beam search,
returning (samples, scores, valid_length). Each distinct (batch, src_len) shape
compiles once and is cached — pair with bucketed loaders so the shape set stays
small.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from tennis_tpu.ops.beam_search import beam_search


class BeamSearchTranslator:
    def __init__(self, model, bos_id: int, eos_id: int, beam_size: int = 4,
                 alpha: float = 1.0, K: int = 5, max_length: int = 100):
        self._model = model
        self._bos = bos_id
        self._eos = eos_id
        self._beam = beam_size
        self._alpha = alpha
        self._K = K
        self._max_length = max_length
        self._jitted = {}

    def _build(self, batch_size: int):
        model = self._model

        @jax.jit
        def run(variables, src, src_valid_length):
            enc_out = model.apply(variables, src, src_valid_length,
                                  method=model.encode)
            states = model.apply(variables, enc_out, src_valid_length,
                                 method=model.init_decoder_state)

            def decode_step(tokens, st):
                return model.apply(variables, tokens, st,
                                   method=model.decode_step)

            return beam_search(
                decode_step, states, batch_size, self._beam, self._bos, self._eos,
                self._max_length, self._alpha, self._K,
            )

        return run

    def translate(self, variables, src, src_valid_length):
        """src (B, T, ...) array-like; returns (samples (B, K, L) int32 on host,
        scores (B, K), valid_length (B, K))."""
        src = jnp.asarray(src)
        vl = jnp.asarray(src_valid_length)
        B = src.shape[0]
        if B not in self._jitted:
            self._jitted[B] = self._build(B)
        samples, scores, lengths = self._jitted[B](variables, src, vl)
        return (jax.device_get(samples), jax.device_get(scores),
                jax.device_get(lengths))

    def translate_tokens(self, variables, src, src_valid_length, vocab):
        """Top-beam hypotheses as token lists (BOS/EOS stripped, the reference's
        consumption pattern train_gnmt.py:291-295)."""
        samples, _, lengths = self.translate(variables, src, src_valid_length)
        out = []
        for b in range(samples.shape[0]):
            vl = int(lengths[b, 0])
            out.append(vocab.to_tokens(samples[b, 0, 1 : vl - 1]))
        return out
