"""Fuzz the jitted beam search against an independent eager reference.

The eager implementation below follows gluonnlp's BeamSearchSampler semantics
directly (python loops, no jax control flow) and is deliberately written in a
different style from tennis_tpu.ops.beam_search so shared-bug risk is low.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tennis_tpu.ops.beam_search import beam_search

V, EOS, BOS = 7, 6, 0


def _decoder(seed):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(V, 5)).astype(np.float32)
    W = rng.normal(size=(5, V)).astype(np.float32)

    def decode_step(tokens, state):
        state = state + jnp.asarray(emb)[tokens]
        return jnp.tanh(state) @ jnp.asarray(W), state

    def decode_np(token, state):
        state = state + emb[token]
        logits = np.tanh(state) @ W
        logp = logits - logits.max()
        logp = logp - np.log(np.exp(logp).sum())
        return logp, state

    return decode_step, decode_np


def _eager_beam(decode_np, beam, max_length, alpha, K):
    def lp(t):
        return ((K + t) / (K + 1)) ** alpha

    # hypotheses: (tokens, raw_cum, state, finished, frozen_score)
    hyps = [([BOS], 0.0, np.zeros(5, np.float32), False, None)]
    # pad to `beam` with dead hypotheses so the first step picks top-`beam` tokens
    for t in range(1, max_length + 1):
        candidates = []
        for tokens, raw, state, finished, frozen in hyps:
            if finished:
                candidates.append((frozen, tokens, raw, state, True))
                continue
            logp, new_state = decode_np(tokens[-1], state)
            for v in range(V):
                cand_raw = raw + float(logp[v])
                candidates.append(
                    (cand_raw / lp(t), tokens + [v], cand_raw, new_state,
                     v == EOS)
                )
        candidates.sort(key=lambda c: -c[0])
        hyps = []
        for score, tokens, raw, state, finished in candidates[:beam]:
            hyps.append((tokens, raw, state, finished,
                         score if finished else None))
        if all(h[3] for h in hyps):
            break

    out = []
    for tokens, raw, state, finished, frozen in hyps:
        n_generated = len(tokens) - 1
        score = frozen if finished else raw / lp(n_generated)
        seq = tokens if finished else tokens + [EOS]
        out.append((score, seq))
    out.sort(key=lambda c: -c[0])
    return out


@pytest.mark.parametrize("seed", range(6))
def test_beam_matches_eager_reference(seed):
    decode_step, decode_np = _decoder(seed)
    beam, max_length, alpha, K = 3, 6, 1.0, 5

    samples, scores, vls = jax.jit(
        lambda s: beam_search(decode_step, s, 1, beam, BOS, EOS, max_length,
                              alpha, K)
    )(jnp.zeros((1, 5), jnp.float32))

    expected = _eager_beam(decode_np, beam, max_length, alpha, K)
    for k in range(beam):
        got_score = float(scores[0, k])
        got_seq = np.asarray(samples[0, k][: int(vls[0, k])]).tolist()
        exp_score, exp_seq = expected[k]
        assert got_score == pytest.approx(exp_score, rel=1e-4), (seed, k)
        assert got_seq == exp_seq, (seed, k, got_seq, exp_seq)


@pytest.mark.parametrize("alpha", [0.0, 0.7])
def test_beam_matches_eager_reference_alpha(alpha):
    decode_step, decode_np = _decoder(99)
    samples, scores, vls = beam_search(
        decode_step, jnp.zeros((1, 5), jnp.float32), 1, 4, BOS, EOS, 5,
        alpha, 5,
    )
    expected = _eager_beam(decode_np, 4, 5, alpha, 5)
    got_seq = np.asarray(samples[0, 0][: int(vls[0, 0])]).tolist()
    assert got_seq == expected[0][1]
    assert float(scores[0, 0]) == pytest.approx(expected[0][0], rel=1e-4)
