import numpy as np
import pytest

from tennis_tpu.data.bucketing import FixedBucketSampler, bucket_keys
from tennis_tpu.metrics.nlg import cider_d, meteor_lite, nlg_metric_suite, rouge_l


def test_bucket_keys_schemes():
    lengths = list(range(10, 110))
    const = bucket_keys(lengths, 5, "constant")
    assert const[-1] >= 109 and len(const) == 5
    lin = bucket_keys(lengths, 5, "linear")
    exp = bucket_keys(lengths, 5, "exp")
    # widths grow for linear/exp
    wl = np.diff([10] + lin)
    assert (np.diff(wl) >= 0).all()
    with pytest.raises(NotImplementedError):
        bucket_keys(lengths, 5, "bogus")


def test_fixed_bucket_sampler_covers_all():
    rng = np.random.default_rng(0)
    lengths = [(int(l), 5) for l in rng.integers(5, 200, size=97)]
    sampler = FixedBucketSampler(lengths, batch_size=8, num_buckets=4, shuffle=True)
    seen = sorted(i for batch in sampler for i in batch)
    assert seen == list(range(97))
    assert "FixedBucketSampler" in sampler.stats()
    assert len(sampler) == sum(1 for _ in iter(sampler))


def test_bucket_batches_have_similar_lengths():
    lengths = [3] * 20 + [100] * 20
    sampler = FixedBucketSampler(lengths, batch_size=8, num_buckets=2)
    for batch in sampler:
        ls = {lengths[i] for i in batch}
        assert len(ls) == 1  # never mixes 3s with 100s


def test_sampler_shuffle_deterministic_and_epoch_varies():
    lengths = list(range(40))
    s1 = FixedBucketSampler(lengths, 4, shuffle=True, seed=7)
    s2 = FixedBucketSampler(lengths, 4, shuffle=True, seed=7)
    assert [b for b in s1] == [b for b in s2]
    s2.set_epoch(1)
    assert [b for b in s1] != [b for b in s2]


def test_rouge_l_hand_value():
    refs = [[["the", "cat", "sat"]]]
    hyp = [["the", "cat"]]
    got = rouge_l(refs, hyp)
    prec, rec, beta = 1.0, 2 / 3, 1.2
    expect = (1 + beta**2) * prec * rec / (rec + beta**2 * prec)
    assert got == pytest.approx(expect, rel=1e-6)
    assert rouge_l(refs, refs[0]) == pytest.approx(1.0)


def test_meteor_lite_hand_value():
    refs = [[["the", "cat", "sat"]]]
    hyp = [["the", "cat"]]
    m, chunks = 2, 1
    p, r = 1.0, 2 / 3
    fmean = p * r / (0.9 * p + 0.1 * r)
    expect = fmean * (1 - 0.5 * (chunks / m) ** 3)
    assert meteor_lite(refs, hyp) == pytest.approx(expect, rel=1e-6)
    assert meteor_lite(refs, [["zz", "yy"]]) == 0.0


def test_meteor_stem_stage():
    """Inflection variants match through the Porter-stem stage (the official
    aligner's exact → stem order), scoring identically to the exact form."""
    refs = [[["player", "serves", "the", "ball"]]]
    exact = meteor_lite(refs, [["player", "serves", "the", "ball"]])
    stemmed = meteor_lite(refs, [["player", "serving", "the", "ball"]])
    assert exact == pytest.approx(1.0 - 0.5 * (1 / 4) ** 3)
    assert stemmed == pytest.approx(exact)
    # unrelated words still do not match
    assert meteor_lite(refs, [["umpire", "walked"]]) == 0.0
    # exact matches take precedence: identical score, not double counting
    assert meteor_lite([[["run", "running"]]],
                       [["running", "run"]]) > 0.0


def test_porter_stemmer_matches_nltk_original():
    nltk_stem = pytest.importorskip("nltk.stem.porter")
    from tennis_tpu.metrics.porter import porter_stem

    ps = nltk_stem.PorterStemmer(mode="ORIGINAL_ALGORITHM")
    # the classic suite from the Porter paper + tennis-commentary words
    words = (
        "caresses ponies ties caress cats feed agreed plastered bled motoring "
        "sing conflated troubled sized hopping tanned falling hissing fizzed "
        "failing filing happy sky relational conditional rational valenci "
        "hesitanci digitizer conformabli radicalli differentli vileli "
        "analogousli vietnamization predication operator feudalism "
        "decisiveness hopefulness callousness formaliti sensitiviti "
        "sensibiliti triplicate formative formalize electriciti electrical "
        "hopeful goodness revival allowance inference airliner gyroscopic "
        "adjustable defensible irritant replacement adjustment dependent "
        "adoption homologou communism activate angulariti homologous "
        "effective bowdlerize probate rate cease controll roll "
        "serves serve served serving ace aces rally rallies volley volleys "
        "forehand backhand hits hitting winner winners player players point "
        "points net lets fault faults deuce advantage game games set sets"
    ).split()
    for w in words:
        assert porter_stem(w) == ps.stem(w), w


def test_cider_orderings():
    refs = [
        [["a", "cat", "sat", "on", "the", "mat"]],
        [["dogs", "run", "fast", "in", "the", "park"]],
        [["birds", "fly", "high", "above", "clouds", "today"]],
    ]
    perfect = [r[0] for r in refs]
    partial = [["a", "cat", "sat", "on", "a", "rug"],
               ["dogs", "walk", "slow", "in", "a", "park"],
               ["birds", "swim", "low", "under", "water", "now"]]
    wrong = [["zz"] * 6] * 3
    s_perfect = cider_d(refs, perfect)
    s_partial = cider_d(refs, partial)
    s_wrong = cider_d(refs, wrong)
    assert s_perfect > s_partial > s_wrong >= 0.0
    assert s_perfect <= 10.0 + 1e-6


def test_nlg_suite_keys_and_perfect_scores():
    refs = [[["the", "cat", "sat", "on", "the", "mat"]],
            [["dogs", "run", "fast", "in", "the", "park"]]]
    hyps = [r[0] for r in refs]
    out = nlg_metric_suite(refs, hyps)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                        "ROUGE_L", "CIDEr"}
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L"):
        assert out[k] == pytest.approx(1.0), k
    assert out["METEOR"] == pytest.approx(1.0 * (1 - 0.5 * (1 / 6) ** 3), rel=1e-3)


def test_rouge_matches_pycoco_if_available():
    pycoco = pytest.importorskip("pycocoevalcap.rouge.rouge")
    refs = {0: ["the cat sat on the mat"], 1: ["dogs run fast"]}
    hyps = {0: ["the cat sat"], 1: ["dogs run fast today"]}
    theirs, _ = pycoco.Rouge().compute_score(refs, hyps)
    ours = rouge_l([[r.split() for r in refs[i]] for i in range(2)],
                   [hyps[i][0].split() for i in range(2)])
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_sampler_stats_aligned_past_empty_bucket():
    """keys/buckets/batch_sizes stay aligned when a middle bucket is empty —
    stats() used to zip unfiltered keys against filtered buckets."""
    lengths = [1, 1, 1, 30]  # middle bucket of 3 is empty
    s = FixedBucketSampler(lengths, batch_size=8, num_buckets=3)
    assert len(s.keys) == len(s.buckets) == len(s.batch_sizes)
    lines = s.stats().splitlines()[1:]
    counts = {int(l.split("<=")[1].split(":")[0]): int(l.split()[1])
              for l in lines}
    assert counts[max(counts)] == 1  # the length-30 sample on the LAST key
    assert sum(counts.values()) == 4


def test_sampler_key_element_buckets_on_caption_length():
    """key_element=-1 buckets tuple lengths on the caption axis (the
    reference's val/test sampler key, utils/captioning.py:38-39)."""
    lengths = [(100, 5), (100, 6), (2, 20), (3, 21)]
    by_src = FixedBucketSampler(lengths, batch_size=4, num_buckets=2)
    by_tgt = FixedBucketSampler(lengths, batch_size=4, num_buckets=2,
                                key_element=-1)
    def groups(s):
        return sorted(tuple(sorted(b)) for b in s.buckets)
    assert groups(by_src) == [(0, 1), (2, 3)]   # frames: {100,100} vs {2,3}
    assert groups(by_tgt) == [(0, 1), (2, 3)]   # captions: {5,6} vs {20,21}
    # and the keys reflect the chosen axis
    assert max(by_src.keys) == 100
    assert max(by_tgt.keys) == 21
