import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tennis_tpu.models.gnmt import NMTModel, get_gnmt_encoder_decoder, \
    masked_ce_loss
from tennis_tpu.translation import BeamSearchTranslator


@pytest.fixture(scope="module")
def trained():
    """Tiny overfit captioner shared across translator tests."""
    V, H, E = 9, 24, 12
    enc, dec = get_gnmt_encoder_decoder(hidden_size=H)
    model = NMTModel(vocab_size=V, encoder=enc, decoder=dec, embed_size=E)
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (2, 6, 5))
    caps = jnp.array([[2, 5, 6, 3, 1], [2, 7, 8, 4, 3]])
    vl = jnp.array([4, 5])
    variables = model.init(rng, src, caps[:, :-1])
    tx = optax.adam(0.01)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(lambda p: masked_ce_loss(
            model.apply({"params": p}, src, caps[:, :-1]), caps[:, 1:], vl - 1
        ))(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, loss

    p = variables["params"]
    for _ in range(250):
        p, opt, loss = step(p, opt)
    return model, {"params": p}, src, caps, vl


def test_translate_shapes_and_order(trained):
    model, variables, src, caps, vl = trained
    tr = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=4,
                              max_length=10)
    samples, scores, lengths = tr.translate(variables, src, jnp.array([6, 6]))
    assert samples.shape[:2] == (2, 4)
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    # top beams reproduce the overfit captions
    for b in range(2):
        got = samples[b, 0][: lengths[b, 0]]
        np.testing.assert_array_equal(got, np.asarray(caps[b][: int(vl[b])]))


def test_translate_tokens_strips_bos_eos(trained):
    model, variables, src, caps, vl = trained

    class TinyVocab:
        bos_token, eos_token = "<bos>", "<eos>"
        idx_to_token = [f"w{i}" for i in range(9)]

        def __getitem__(self, t):
            return {"<bos>": 2, "<eos>": 3}[t]

        def to_tokens(self, ids):
            return [self.idx_to_token[int(i)] for i in ids]

    tr = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=4,
                              max_length=10)
    toks = tr.translate_tokens(variables, src, jnp.array([6, 6]), TinyVocab())
    assert toks[0] == [f"w{int(i)}" for i in caps[0][1 : int(vl[0]) - 1]]


def test_translate_caches_per_batch_size(trained):
    model, variables, src, caps, vl = trained
    tr = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=2,
                              max_length=6)
    tr.translate(variables, src, jnp.array([6, 6]))
    tr.translate(variables, src[:1], jnp.array([6]))
    assert set(tr._jitted) == {1, 2}


def test_source_valid_length_masks_encoder(trained):
    """Shorter source valid-length must change the decode (attention masked)."""
    model, variables, src, caps, vl = trained
    tr = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=2,
                              max_length=10)
    full = tr.translate(variables, src, jnp.array([6, 6]))
    short = tr.translate(variables, src, jnp.array([1, 1]))
    assert not np.array_equal(full[0], short[0]) or not np.array_equal(
        full[1], short[1]
    )
