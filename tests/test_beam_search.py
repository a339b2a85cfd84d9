import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tennis_tpu.ops.beam_search import beam_search

V = 5  # vocab: 0=pad-ish, 1..3 words, 4=eos
EOS = 4
BOS = 0


def _make_decode_step(seed=0, hidden=6):
    """Tiny deterministic decoder: state = running embedding sum; logits = MLP."""
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(V, hidden)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(hidden, V)), jnp.float32)

    def decode_step(tokens, state):
        state = state + emb[tokens]
        logits = jnp.tanh(state) @ W
        return logits, state

    return decode_step


def _logp_fn(decode_step):
    def fn(tokens, state):
        logits, state = decode_step(jnp.asarray(tokens), state)
        return np.asarray(jax.nn.log_softmax(logits, axis=-1)), state

    return fn


def _brute_force(decode_step, max_length, alpha, K, batch=1):
    """Enumerate every hypothesis (ending at EOS or at max_length) and score it with
    the same length penalty; return the best (score, sequence-with-bos-eos)."""
    logp = _logp_fn(decode_step)

    def lp(t):
        return ((K + t) / (K + 1)) ** alpha

    best = (-np.inf, None)
    # sequences of generated tokens; EOS terminates early
    for length in range(1, max_length + 1):
        for seq in itertools.product(range(V), repeat=length):
            if EOS in seq[:-1]:
                continue  # eos only allowed at the end
            finished = seq[-1] == EOS
            if not finished and length < max_length:
                continue  # unfinished hypotheses only scored at the budget limit
            state = jnp.zeros((1, 6), jnp.float32)
            tokens = [BOS] + list(seq)
            cum = 0.0
            for t in range(length):
                lps, state = logp(np.asarray([tokens[t]]), state)
                cum += float(lps[0, tokens[t + 1]])
            score = cum / lp(length)
            if score > best[0]:
                best = (score, tuple(tokens))
    return best


def test_beam_exhaustive_matches_brute_force():
    """With beam ≥ #alive prefixes the search is exhaustive → must equal brute force."""
    decode_step = _make_decode_step(seed=3)
    max_length, alpha, K = 3, 1.0, 5
    beam = V**3  # enough to hold every prefix at every depth

    init_state = jnp.zeros((1, 6), jnp.float32)
    samples, scores, vl = jax.jit(
        lambda s: beam_search(decode_step, s, 1, beam, BOS, EOS, max_length,
                              alpha, K)
    )(init_state)
    bf_score, bf_seq = _brute_force(decode_step, max_length, alpha, K)

    got = np.asarray(samples[0, 0])
    got_vl = int(vl[0, 0])
    got_score = float(scores[0, 0])
    assert got_score == pytest.approx(bf_score, rel=1e-4)
    finished = bf_seq[-1] == EOS
    expect = bf_seq if finished else bf_seq + (EOS,)
    np.testing.assert_array_equal(got[:got_vl], np.asarray(expect))


def test_beam_scores_sorted_and_shapes():
    decode_step = _make_decode_step(seed=1)
    B, K = 3, 4
    init_state = jnp.zeros((B, 6), jnp.float32)
    samples, scores, vl = beam_search(decode_step, init_state, B, K, BOS, EOS,
                                      max_length=6)
    assert samples.shape == (B, K, 8) and scores.shape == (B, K)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    v = np.asarray(vl)
    assert (v >= 2).all() and (v <= 8).all()
    # first token is always BOS; token at vl-1 is EOS
    smp = np.asarray(samples)
    assert (smp[:, :, 0] == BOS).all()
    for b in range(B):
        for k in range(K):
            assert smp[b, k, v[b, k] - 1] == EOS


def test_beam_first_step_distinct_tokens():
    """The first expansion must spread over distinct top tokens, not clones."""
    decode_step = _make_decode_step(seed=2)
    samples, _, vl = beam_search(decode_step, jnp.zeros((1, 6)), 1, 3, BOS, EOS,
                                 max_length=1)
    first_tokens = np.asarray(samples[0, :, 1])
    assert len(set(first_tokens.tolist())) == 3


def test_beam_deterministic():
    decode_step = _make_decode_step(seed=5)
    run = lambda: beam_search(decode_step, jnp.zeros((2, 6)), 2, 4, BOS, EOS, 5)
    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_beam_through_nmt_model():
    """End-to-end: overfit a tiny captioner, then beam decode must reproduce the
    training captions (the strongest correctness signal for decoder+beam)."""
    import optax

    from tennis_tpu.models.gnmt import NMTModel, get_gnmt_encoder_decoder, \
        masked_ce_loss

    Vv, H, E = 9, 24, 12
    enc, dec = get_gnmt_encoder_decoder(hidden_size=H)
    model = NMTModel(vocab_size=Vv, encoder=enc, decoder=dec, embed_size=E)

    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (3, 6, 5))  # 3 "videos" of 6 feature frames
    # captions: bos(2) w... eos(3), padded with 1
    caps = jnp.array([
        [2, 5, 6, 7, 3, 1],
        [2, 8, 4, 3, 1, 1],
        [2, 6, 6, 5, 8, 3],
    ])
    cap_vl = jnp.array([5, 4, 6])

    variables = model.init(rng, src, caps[:, :-1])
    tx = optax.adam(0.01)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, src, caps[:, :-1])
            return masked_ce_loss(logits, caps[:, 1:], cap_vl - 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for i in range(300):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.05, f"did not overfit: loss={float(loss)}"

    # beam decode
    enc_out = model.apply({"params": params}, src, method=model.encode)
    states = model.apply({"params": params}, enc_out,
                         method=model.init_decoder_state)

    def decode_step(tokens, states):
        return model.apply({"params": params}, tokens, states,
                           method=model.decode_step)

    samples, scores, vl = beam_search(decode_step, states, 3, 4, bos_id=2,
                                      eos_id=3, max_length=8, alpha=1.0, K=5)
    for b in range(3):
        got = np.asarray(samples[b, 0][: int(vl[b, 0])])
        expect = np.asarray(caps[b][: int(cap_vl[b])])
        np.testing.assert_array_equal(got, expect)
