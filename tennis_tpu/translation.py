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
                 alpha: float = 1.0, K: int = 5, max_length: int = 100,
                 use_pallas_gru: bool = True, mesh=None):
        """``use_pallas_gru`` routes the encoder's GRU recurrences through the
        VMEM-resident Pallas kernel (ops/pallas/gru.py) — forward-only, which is
        exactly this decode path. Measured on v5e with the loop-carried timing
        protocol (features path, B=32, T=120, C=4096, beam 4, full 30-step
        decode): 4.21 → 1.60 ms/batch, a 2.6× end-to-end decode speedup,
        numerics identical (tests/test_pallas_gru.py). Falls back to the XLA
        scan automatically off-TPU or when the sequence exceeds the kernel's
        VMEM budget; pass False to force the scan.

        ``mesh`` data-parallelizes the decode: batch rows shard over the mesh's
        data axis (params replicated), ragged batches pad up to the axis size
        and slice back. Every beam-search op is per-row independent, so the
        only collective GSPMD inserts is the scalar all-finished reduction of
        the while_loop condition. The reference's sampler is single-device
        eager Python (reference utils/translation.py:55-82)."""
        self._model = model
        self._bos = bos_id
        self._eos = eos_id
        self._beam = beam_size
        self._alpha = alpha
        self._K = K
        self._max_length = max_length
        self._use_pallas_gru = use_pallas_gru
        self._mesh = mesh
        self._jitted = {}

    def build_decoder(self, batch_size: int):
        """The unjitted ``(variables, src, src_valid_length) → (samples,
        scores, valid_length)`` decode program for a static batch — the trace
        surface ``tennis_tpu.export`` freezes through ``jax.export`` (params
        baked in as constants). ``translate`` below jits the same program."""
        model = self._model

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

    def _build(self, batch_size: int):
        run = self.build_decoder(batch_size)
        if self._mesh is not None:
            from tennis_tpu.parallel.mesh import batch_sharding, replicated
            return jax.jit(run, in_shardings=(
                replicated(self._mesh), batch_sharding(self._mesh),
                batch_sharding(self._mesh)))
        return jax.jit(run)

    def translate(self, variables, src, src_valid_length):
        """src (B, T, ...) array-like; returns (samples (B, K, L) int32 on host,
        scores (B, K), valid_length (B, K))."""
        from tennis_tpu.ops.rnn import pallas_gru

        src = jnp.asarray(src)
        vl = jnp.asarray(src_valid_length)
        B = src.shape[0]
        n_data = self._mesh.shape["data"] if self._mesh is not None else 1
        if B % n_data:
            from tennis_tpu.parallel.mesh import pad_batch
            (src, vl), _ = pad_batch((src, vl), n_data)
        Bp = src.shape[0]
        if Bp not in self._jitted:
            self._jitted[Bp] = self._build(Bp)
        # the context must be active while the jit TRACES (first call per shape)
        with pallas_gru(self._use_pallas_gru):
            samples, scores, lengths = self._jitted[Bp](variables, src, vl)
        # under a POD mesh the outputs span multiple processes and a plain
        # device_get raises; fetch_global all-gathers in lockstep (and is a
        # plain device_get when fully addressable — the single-host case)
        from tennis_tpu.parallel.distributed import fetch_global

        samples, scores, lengths = fetch_global((samples, scores, lengths))
        return samples[:B], scores[:B], lengths[:B]

    def translate_tokens(self, variables, src, src_valid_length, vocab):
        """Top-beam hypotheses as token lists (BOS/EOS stripped, the reference's
        consumption pattern train_gnmt.py:291-295)."""
        samples, _, lengths = self.translate(variables, src, src_valid_length)
        out = []
        for b in range(samples.shape[0]):
            vl = int(lengths[b, 0])
            out.append(vocab.to_tokens(samples[b, 0, 1 : vl - 1]))
        return out
