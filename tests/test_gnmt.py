import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.models.gnmt import (
    GNMTDecoder,
    GNMTEncoder,
    NMTModel,
    get_gnmt_encoder_decoder,
    masked_ce_loss,
)

RNG = jax.random.PRNGKey(0)
H, E, V = 16, 8, 12


def _model(cell="gru", num_layers=2, num_bi=1):
    enc, dec = get_gnmt_encoder_decoder(cell_type=cell, num_layers=num_layers,
                                        num_bi_layers=num_bi, hidden_size=H)
    return NMTModel(vocab_size=V, encoder=enc, decoder=dec, embed_size=E)


def test_encoder_shapes_and_masking():
    enc = GNMTEncoder(hidden_size=H, num_layers=2, num_bi_layers=1)
    x = jax.random.normal(RNG, (3, 7, 5))
    vl = jnp.array([7, 4, 2])
    params = enc.init(RNG, x, vl)
    out, states = enc.apply(params, x, vl)
    assert out.shape == (3, 7, H)
    assert len(states) == 2
    assert (np.asarray(out[1, 4:]) == 0).all()  # masked past valid length


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_teacher_forcing_matches_stepwise(cell):
    """decode_seq (nn.scan) and per-step __call__ must share params and agree."""
    model = _model(cell)
    src = jax.random.normal(RNG, (2, 5, 6))
    tgt = jax.random.randint(RNG, (2, 4), 0, V)
    vl = jnp.array([5, 3])
    variables = model.init(RNG, src, tgt, vl)

    logits_seq = model.apply(variables, src, tgt, vl)
    assert logits_seq.shape == (2, 4, V)

    # step-by-step through decode_step
    enc_out = model.apply(variables, src, vl, method=model.encode)
    states = model.apply(variables, enc_out, vl, method=model.init_decoder_state)
    outs = []
    for t in range(4):
        logits_t, states = model.apply(variables, tgt[:, t], states,
                                       method=model.decode_step)
        outs.append(logits_t)
    logits_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_seq), np.asarray(logits_step), atol=2e-5
    )


def test_masked_ce_loss():
    logits = jnp.zeros((2, 3, V))
    labels = jnp.zeros((2, 3), jnp.int32)
    vl = jnp.array([3, 1])
    # uniform logits → CE = log(V) per valid step
    loss_padded = masked_ce_loss(logits, labels, vl, average="padded")
    expected = (3 * np.log(V) / 3 + 1 * np.log(V) / 3) / 2
    assert float(loss_padded) == pytest.approx(expected, rel=1e-5)
    loss_valid = masked_ce_loss(logits, labels, vl, average="valid")
    assert float(loss_valid) == pytest.approx(np.log(V), rel=1e-5)


def test_gnmt_gradients_flow_everywhere():
    model = _model()
    src = jax.random.normal(RNG, (2, 5, 6))
    tgt = jax.random.randint(RNG, (2, 4), 0, V)
    variables = model.init(RNG, src, tgt)

    def loss(params):
        logits = model.apply({"params": params}, src, tgt)
        return masked_ce_loss(logits, tgt, jnp.array([4, 4]))

    grads = jax.grad(loss)(variables["params"])
    zero_paths = [
        jax.tree_util.keystr(p)
        for p, g in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.abs(g).max()) == 0.0
    ]
    assert zero_paths == [], f"dead params: {zero_paths}"


def test_nmt_with_src_backbone():
    from tennis_tpu.models import get_backbone

    enc, dec = get_gnmt_encoder_decoder(hidden_size=H)
    model = NMTModel(vocab_size=V, encoder=enc, decoder=dec, embed_size=E,
                     src_embed=get_backbone("resnet18_v2", dtype=jnp.float32))
    src = jnp.ones((1, 2, 32, 32, 3))  # (B, T, H, W, C) pixel path
    tgt = jnp.zeros((1, 3), jnp.int32)
    variables = model.init(RNG, src, tgt)
    logits = model.apply(variables, src, tgt)
    assert logits.shape == (1, 3, V)


def test_encoder_valid_length_equals_truncated():
    """Encoder states/outputs at valid_length must equal running on the truncated
    sequence (MXNet unroll-with-valid_length semantics)."""
    enc = GNMTEncoder(hidden_size=H, num_layers=2, num_bi_layers=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 5))
    params = enc.init(RNG, x, jnp.array([7]))
    out_full, states_full = enc.apply(params, x, jnp.array([4]))
    out_trunc, states_trunc = enc.apply(params, x[:, :4], jnp.array([4]))
    np.testing.assert_allclose(np.asarray(out_full[:, :4]),
                               np.asarray(out_trunc), atol=1e-5)
    assert (np.asarray(out_full[:, 4:]) == 0).all()
    for sf, st_ in zip(jax.tree_util.tree_leaves(states_full),
                       jax.tree_util.tree_leaves(states_trunc)):
        np.testing.assert_allclose(np.asarray(sf), np.asarray(st_), atol=1e-5)
