"""GNMT-style encoder/decoder and NMT captioning model.

TPU-native rebuild of the reference captioner (reference models/captioning/gnmt.py:
30-455 plus gluonnlp's ``NMTModel``): the encoder's per-layer Python ``unroll``
(gnmt.py:141-156) becomes masked ``lax.scan`` layers, and the decoder's per-step
Python loop (gnmt.py:288-294) becomes an ``nn.scan`` over a single step function
whose carried state is exactly the reference's ``[rnn_states, attention_vec]``
(memory value/masks stay loop-invariant, gnmt.py:333-343).

Structure (gnmt_v2, reference gnmt.py:30-47,163-168):
- encoder: ``num_bi_layers`` bidirectional GRU/LSTM layers, then unidirectional
  layers; residual connections on uni layers with index > num_bi_layers when
  enabled; output sequence-masked (gnmt.py:157-159);
- decoder: layer 0 consumes concat(step_input, attention_vec); scaled-Luong
  attention queries layer-0's output against the encoder memory; layers 1..n-1
  consume concat(prev_out, attention_vec), with optional residual (gnmt.py:376-399);
- the decoder's initial rnn_states come from the encoder (backward states for bi
  layers, gnmt.py:146-148), attention_vec starts at zeros (gnmt.py:242-245).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tennis_tpu.ops.attention import LuongAttention
from tennis_tpu.ops.masking import sequence_mask
from tennis_tpu.ops.rnn import BiRNN, RNNLayer, make_cell


class GNMTEncoder(nn.Module):
    cell_type: str = "gru"
    num_layers: int = 2
    num_bi_layers: int = 1
    hidden_size: int = 128
    dropout: float = 0.0
    use_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_length=None, train: bool = False):
        """(B, T, C) → (outputs (B, T, H) masked, states list per layer)."""
        assert self.num_bi_layers <= self.num_layers
        x = inputs.astype(self.dtype)
        states = []
        for i in range(self.num_layers):
            if i < self.num_bi_layers:
                (l_final, r_final), out = BiRNN(
                    self.cell_type, self.hidden_size, dtype=self.dtype,
                    name=f"rnn{i}",
                )(x, valid_length)
                states.append(r_final)  # backward state, gnmt.py:146-148
            else:
                final, out = RNNLayer(
                    self.cell_type, self.hidden_size, dtype=self.dtype,
                    name=f"rnn{i}",
                )(x, valid_length)
                states.append(final)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
            if self.use_residual and i > self.num_bi_layers:
                out = out + x
            x = out
        if valid_length is not None:
            x = sequence_mask(x, valid_length, axis=1)
        return x, states


class GNMTDecoderStep(nn.Module):
    """One decoding step; shared parameters across time via nn.scan in decode_seq."""

    cell_type: str = "gru"
    num_layers: int = 2
    hidden_size: int = 128
    dropout: float = 0.0
    use_residual: bool = False
    dtype: Any = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, carry, step_input, mem_value, mem_masks):
        train = self.train
        rnn_states, attention_vec = carry
        new_states = []
        cell0 = make_cell(self.cell_type, self.hidden_size, self.dtype, name="rnn0")
        state0, rnn_out = cell0(
            rnn_states[0],
            jnp.concatenate([step_input.astype(self.dtype), attention_vec], axis=-1),
        )
        new_states.append(state0)

        attention_vec, attn_weights = LuongAttention(
            self.hidden_size, dtype=self.dtype, name="attention"
        )(rnn_out[:, None, :], mem_value, mem_value, mem_masks)
        attention_vec = attention_vec[:, 0, :]  # (B, H)

        for i in range(1, self.num_layers):
            curr_input = rnn_out
            cell = make_cell(self.cell_type, self.hidden_size, self.dtype,
                             name=f"rnn{i}")
            state_i, rnn_out = cell(
                rnn_states[i], jnp.concatenate([curr_input, attention_vec], axis=-1)
            )
            rnn_out = nn.Dropout(self.dropout, deterministic=not train)(rnn_out)
            if self.use_residual:
                rnn_out = rnn_out + curr_input
            new_states.append(state_i)

        return (tuple(new_states), attention_vec), (rnn_out, attn_weights)


class GNMTDecoder(nn.Module):
    """Decoder over (B, T, E) step inputs; the time axis is ALWAYS an ``nn.scan``,
    and one-step decoding (beam search) is simply a T=1 call — so the scanned and
    stepwise paths share one parameter tree by construction."""

    cell_type: str = "gru"
    num_layers: int = 2
    hidden_size: int = 128
    dropout: float = 0.0
    use_residual: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def init_state(encoder_states, mem_value, mem_valid_length=None):
        """[rnn_states, attention_vec, mem_value, mem_masks] (gnmt.py:224-252)."""
        B, T, H = mem_value.shape
        attention_vec = jnp.zeros((B, H), mem_value.dtype)
        mem_masks = None
        if mem_valid_length is not None:
            mem_masks = (
                jnp.arange(T)[None, :] < mem_valid_length[:, None].astype(jnp.int32)
            )
        return tuple(encoder_states), attention_vec, mem_value, mem_masks

    @nn.compact
    def __call__(self, inputs, states, valid_length=None, train: bool = False):
        """(B, T, E) teacher-forced decode → ((B, T, H) outputs, new states)."""
        rnn_states, attention_vec, mem_value, mem_masks = states
        scan = nn.scan(
            GNMTDecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(1, nn.broadcast, nn.broadcast),
            out_axes=1,
        )
        carry, (outputs, _) = scan(
            self.cell_type, self.num_layers, self.hidden_size, self.dropout,
            self.use_residual, self.dtype, train, name="step",
        )((rnn_states, attention_vec), inputs, mem_value, mem_masks)
        if valid_length is not None:
            outputs = sequence_mask(outputs, valid_length, axis=1)
        new_rnn_states, new_attention_vec = carry
        return outputs, (new_rnn_states, new_attention_vec, mem_value, mem_masks)

    def decode_seq(self, inputs, states, valid_length=None, train: bool = False):
        return self(inputs, states, valid_length, train)


class NMTModel(nn.Module):
    """src_embed → encoder → decoder → tgt_proj, with a token-embedding tgt_embed
    (gluonnlp ``NMTModel`` surface used at reference train_gnmt.py:228-229).

    ``src_embed`` is any module mapping raw source steps to vectors: the
    TimeDistributed CNN backbone for pixels (train_gnmt.py:149-170) or None for
    precomputed features (identity, train_gnmt.py:188-194).

    ``mem_sharding`` (an optional ``NamedSharding`` over (batch, time, units))
    turns the attention memory sequence-parallel: the encoder output — the
    largest live activation for long points, hundreds of frames per source —
    is constrained to shard its TIME axis across the mesh, and GSPMD partitions
    every per-step attention (scores, masked softmax, context) with the
    matching collectives. The reference has no counterpart (single-GPU,
    gluonnlp Python decode); SURVEY §5.7's plan made the time axis shardable
    precisely so this is a sharding annotation, not a rewrite.
    """

    vocab_size: int
    encoder: GNMTEncoder
    decoder: GNMTDecoder
    embed_size: int = 100
    src_embed: Optional[nn.Module] = None
    dtype: Any = jnp.float32
    mem_sharding: Any = None

    def setup(self):
        self.tgt_embed = nn.Embed(self.vocab_size, self.embed_size,
                                  dtype=self.dtype, name="tgt_embed")
        self.tgt_proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="tgt_proj")

    def embed_src(self, src, train: bool = False):
        """Pixels path: raw uint8 frames get the fused on-device stage — train-time
        flip/jitter/lighting via the ``augment`` rng stream (the reference's
        transform_train, train_gnmt.py:172-180, applied per frame since B and T
        fold into one batch axis), eval-time plain normalize (transform_test,
        train_gnmt.py:182-187)."""
        if self.src_embed is None:
            return src.astype(self.dtype)
        B, T = src.shape[:2]
        flat = src.reshape((B * T,) + src.shape[2:])
        if flat.dtype == jnp.uint8:
            from tennis_tpu.data.transforms import device_augment, device_prepare

            if train:
                flat = device_augment(flat, self.make_rng("augment"),
                                      dtype=self.dtype)
            else:
                flat = device_prepare(flat, dtype=self.dtype)
        emb = self.src_embed(flat, train=train)
        return emb.reshape((B, T, -1))

    def encode(self, src, valid_length=None, train: bool = False):
        src = self.embed_src(src, train=train)
        return self.encoder(src, valid_length, train=train)

    def init_decoder_state(self, encoder_outputs, src_valid_length=None):
        mem_value, enc_states = encoder_outputs
        if self.mem_sharding is not None:
            # sequence-parallel attention memory: one constraint here covers
            # BOTH consumers (teacher-forced decode_seq and the beam search's
            # decode_step carry the memory in the decoder state)
            import jax

            mem_value = jax.lax.with_sharding_constraint(
                mem_value, self.mem_sharding)
        return self.decoder.init_state(enc_states, mem_value, src_valid_length)

    def decode_step(self, step_tokens, states, train: bool = False):
        """Beam-search step: token ids (B,) → (logits (B, V), new states)."""
        emb = self.tgt_embed(step_tokens.astype(jnp.int32))
        out, new_states = self.decoder(emb[:, None, :], states, train=train)
        return self.tgt_proj(out[:, 0]), new_states

    def __call__(self, src, tgt_tokens, src_valid_length=None,
                 tgt_valid_length=None, train: bool = False):
        """Teacher-forced training forward → logits (B, T_tgt, V)."""
        encoder_outputs = self.encode(src, src_valid_length, train=train)
        states = self.init_decoder_state(encoder_outputs, src_valid_length)
        tgt_emb = self.tgt_embed(tgt_tokens.astype(jnp.int32))
        outputs, _ = self.decoder(tgt_emb, states, tgt_valid_length, train=train)
        return self.tgt_proj(outputs)


def masked_ce_loss(logits, labels, valid_length, average: str = "padded",
                   sample_weights=None):
    """gluonnlp ``MaskedSoftmaxCELoss`` semantics (reference train_gnmt.py:31,332-334):
    per-step CE masked past ``valid_length``; per-sample mean over the **padded**
    length (gluon's batch-axis-excluded mean), then mean over the batch.
    ``average='valid'`` divides by the true lengths instead. ``sample_weights``
    (B,) replaces the batch mean with a weighted mean — zero-weight rows drop
    out exactly, which is how sharded eval masks batch rows padded up to the
    device count (the mesh-eval analogue of the pooled final test's wrap
    masking)."""
    import optax

    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )  # (B, T)
    T = ce.shape[1]
    mask = jnp.arange(T)[None, :] < valid_length[:, None].astype(jnp.int32)
    ce = jnp.where(mask, ce, 0.0)
    if average == "padded":
        per_sample = ce.sum(axis=1) / T
    else:
        per_sample = ce.sum(axis=1) / jnp.maximum(valid_length.astype(jnp.float32), 1)
    if sample_weights is not None:
        w = sample_weights.astype(jnp.float32)
        return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)
    return per_sample.mean()


def get_gnmt_encoder_decoder(cell_type="gru", num_layers=2, num_bi_layers=1,
                             hidden_size=128, dropout=0.0, use_residual=False,
                             dtype=jnp.float32):
    """Factory mirroring reference gnmt.py:407-455."""
    encoder = GNMTEncoder(cell_type=cell_type, num_layers=num_layers,
                          num_bi_layers=num_bi_layers, hidden_size=hidden_size,
                          dropout=dropout, use_residual=use_residual, dtype=dtype)
    decoder = GNMTDecoder(cell_type=cell_type, num_layers=num_layers,
                          hidden_size=hidden_size, dropout=dropout,
                          use_residual=use_residual, dtype=dtype)
    return encoder, decoder
