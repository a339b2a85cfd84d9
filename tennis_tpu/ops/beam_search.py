"""Batched beam search as a single jitted ``lax.while_loop``.

TPU-native replacement for gluonnlp's eager ``BeamSearchSampler`` (reference
utils/translation.py:28-82): the whole search — per-step decode, length-penalty
scoring, EOS bookkeeping, beam reordering — is one compiled program with static
shapes. Batch and beam fold into one leading device axis, so every decoder matmul
sees a (B·K) batch.

Scoring follows gluonnlp's ``BeamSearchScorer(alpha, K)`` exactly: the ranking score
of a hypothesis of length t is ``cum_logprob / lp(t)`` with
``lp(t) = ((K + t) / (K + 1)) ** alpha`` — the telescoped form of gluonnlp's
incremental update. Finished beams freeze their penalized score and compete as
single candidates (propagation semantics of BeamSearchSampler).

Returned samples start with BOS and include the EOS position in ``valid_length``
(callers strip ``[1:vl-1]`` — reference train_gnmt.py:291-295).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def _lp(t, alpha: float, K: int):
    return jnp.power((K + t.astype(jnp.float32)) / (K + 1), alpha)


def _tile_beam(tree, beam_size: int):
    """(B, ...) → (B*K, ...) by repeating each batch row K times."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0) if hasattr(x, "ndim") else x, tree
    )


def _gather_beams(tree, parent, batch_size: int, beam_size: int):
    """Reorder the (B*K, ...) state leaves by per-batch parent beam indices (B, K)."""
    flat_parent = (
        parent + jnp.arange(batch_size)[:, None] * beam_size
    ).reshape(-1)  # (B*K,) indices into the flattened beam axis

    def gather(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        return jnp.take(x, flat_parent, axis=0)

    return jax.tree_util.tree_map(gather, tree)


def beam_search(
    decode_step: Callable,
    init_states: Any,
    batch_size: int,
    beam_size: int,
    bos_id: int,
    eos_id: int,
    max_length: int,
    alpha: float = 1.0,
    K: int = 5,
):
    """Run beam search.

    Args:
        decode_step: ``(tokens (N,), states) -> (logits (N, V), new_states)`` with
            ``N = batch_size * beam_size``; must be jax-traceable.
        init_states: decoder state pytree with leading batch axis ``batch_size``
            (tiled to the beam internally).
        max_length: decode-step budget (excludes BOS).

    Returns:
        samples (B, K, max_length+2) int32 — BOS first, EOS included;
        scores (B, K) float32 — length-penalized log-prob, descending;
        valid_length (B, K) int32 — includes BOS and EOS (consumers strip
        ``[1:vl-1]``; unfinished beams get a trailing EOS appended, as in gluonnlp).
    """
    B, Kb = batch_size, beam_size
    L = max_length + 2  # BOS + up to max_length tokens + EOS slot

    states = _tile_beam(init_states, Kb)
    seqs = jnp.full((B, Kb, L), eos_id, jnp.int32).at[:, :, 0].set(bos_id)
    # only beam 0 is live initially so the first expansion picks K distinct tokens
    scores = jnp.where(
        jnp.arange(Kb)[None, :] == 0, 0.0, NEG_INF
    ).astype(jnp.float32).repeat(B, axis=0).reshape(B, Kb)
    finished = jnp.zeros((B, Kb), bool)
    lengths = jnp.ones((B, Kb), jnp.int32)  # BOS counted

    def cond(carry):
        t, _, _, finished, _, _ = carry
        return jnp.logical_and(t < max_length, ~jnp.all(finished))

    def body(carry):
        t, seqs, scores, finished, lengths, states = carry
        last_tokens = jnp.take_along_axis(
            seqs.reshape(B * Kb, L), lengths.reshape(B * Kb, 1) - 1, axis=1
        )[:, 0]
        logits, new_states = decode_step(last_tokens, states)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        logp = logp.reshape(B, Kb, V)

        step = t + 1  # hypotheses extended this round have `step` generated tokens
        lp_t = _lp(step, alpha, K)

        # alive expansions: raw cumulative / lp(step); finished rows excluded
        raw_alive = jnp.where(finished[..., None], NEG_INF, scores[..., None] + logp)
        penalized_alive = raw_alive / lp_t

        # finished beams compete with their frozen penalized score
        keep_scores = jnp.where(finished, scores, NEG_INF)

        candidates = jnp.concatenate(
            [penalized_alive.reshape(B, Kb * V), keep_scores], axis=1
        )  # (B, Kb*V + Kb)
        top_scores, top_idx = jax.lax.top_k(candidates, Kb)

        from_keep = top_idx >= Kb * V
        parent = jnp.where(from_keep, top_idx - Kb * V, top_idx // V)
        token = jnp.where(from_keep, eos_id, top_idx % V)

        # reorder everything by parent
        new_states = _gather_beams(new_states, parent, B, Kb)
        # NOTE: states for kept-finished beams were advanced by a spurious decode
        # step, but they are never read again (the beam only re-emits its frozen
        # score), so this is safe.
        seqs = jnp.take_along_axis(seqs, parent[..., None], axis=1)
        lengths = jnp.take_along_axis(lengths, parent, axis=1)
        prev_finished = jnp.take_along_axis(finished, parent, axis=1)

        now_eos = jnp.logical_and(~from_keep, token == eos_id)
        new_finished = jnp.logical_or(from_keep & prev_finished, now_eos)

        # write the new token for expanded beams at position `lengths` (after BOS):
        # a broadcasted positional mask instead of per-row scatters (VPU-friendly)
        expanded = ~from_keep
        pos_mask = (
            jnp.arange(L)[None, None, :] == lengths[..., None]
        ) & expanded[..., None]
        seqs = jnp.where(pos_mask, token[..., None], seqs)

        lengths = jnp.where(expanded, lengths + 1, lengths)
        # scores: alive beams carry raw cumulative logprob; finished beams (newly or
        # kept) carry their frozen penalized score
        raw_expanded = top_scores * lp_t  # invert penalty → raw cum for alive
        scores = jnp.where(new_finished, top_scores, raw_expanded)

        # finished-ness travels with the gathered parent (prev_finished), never with
        # the slot position
        return step, seqs, scores, new_finished, lengths, new_states

    t0 = jnp.asarray(0, jnp.int32)
    t, seqs, scores, finished, lengths, states = jax.lax.while_loop(
        cond, body, (t0, seqs, scores, finished, lengths, states)
    )

    # final scores: alive beams penalized at their current length
    final_scores = jnp.where(finished, scores, scores / _lp(lengths - 1, alpha, K))
    order = jnp.argsort(-final_scores, axis=1)
    seqs = jnp.take_along_axis(seqs, order[..., None], axis=1)
    final_scores = jnp.take_along_axis(final_scores, order, axis=1)
    lengths = jnp.take_along_axis(lengths, order, axis=1)
    finished = jnp.take_along_axis(finished, order, axis=1)
    # lengths count BOS and, for finished beams, the written EOS; unfinished beams
    # get the (pre-initialised) EOS at position `lengths` counted in, so consumers
    # can uniformly strip [1:vl-1]
    valid_length = jnp.where(finished, lengths, lengths + 1)
    return seqs, final_scores, valid_length
