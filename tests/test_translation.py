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


def test_translate_mesh_matches_single_device(trained):
    """Mesh-sharded beam decode (batch over the data axis, ragged batch padded
    up to the axis size) must reproduce the single-device decode exactly —
    same program, GSPMD-partitioned."""
    from tennis_tpu.parallel import make_mesh

    model, variables, src, caps, vl = trained
    # ragged: B=3 over 4 data-axis devices → pads to 4, slices back to 3
    src3 = jnp.concatenate([src, src[:1]], axis=0)
    vl3 = jnp.array([6, 6, 6])

    single = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=4,
                                  max_length=10)
    want = single.translate(variables, src3, vl3)

    mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
    sharded = BeamSearchTranslator(model, bos_id=2, eos_id=3, beam_size=4,
                                   max_length=10, mesh=mesh)
    got = sharded.translate(variables, src3, vl3)
    assert 4 in sharded._jitted  # compiled at the padded batch size
    np.testing.assert_array_equal(got[0], want[0])       # samples
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5, atol=1e-6)  # scores
    np.testing.assert_array_equal(got[2], want[2])       # valid lengths


def test_masked_ce_sample_weights(trained):
    """Zero-weight rows drop out exactly: loss over [real; padded] rows with
    weights [1,1,0] equals the unweighted loss over the real rows."""
    model, variables, src, caps, vl = trained
    logits = model.apply(variables, src, caps[:, :-1])
    base = float(masked_ce_loss(logits, caps[:, 1:], vl - 1))
    logits3 = jnp.concatenate([logits, logits[:1]], axis=0)
    caps3 = jnp.concatenate([caps, caps[:1]], axis=0)
    vl3 = jnp.concatenate([vl, vl[:1]])
    w = jnp.array([1.0, 1.0, 0.0])
    weighted = float(masked_ce_loss(logits3, caps3[:, 1:], vl3 - 1,
                                    sample_weights=w))
    np.testing.assert_allclose(weighted, base, rtol=1e-6)
