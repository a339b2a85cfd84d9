"""Golden pinning of the NLG suite against hand-derived values of the
official formulations (pycocoevalcap rouge.py / cider.py, METEOR's published
scoring function). No scorer tools run here — every expected number below is
derived by hand from the published formulas, with the arithmetic shown — so
these tests catch implementation drift in tennis_tpu.metrics.nlg against the
conventions the parity tables assume (PARITY.md D1/D2; the CIDEr ×10 scale
that gate_captioning's ×100 convention builds on)."""
import math

import numpy as np
import pytest

from tennis_tpu.metrics.nlg import cider_d, meteor_lite, nlg_metric_suite, rouge_l


# ---------------------------------------------------------------- ROUGE-L

def test_rouge_l_hand_derived():
    """pycocoevalcap rouge.py: F = (1+b^2)PR / (R + b^2 P), b=1.2.
    ref 'the cat sat on the mat' (6), hyp 'the cat on the mat' (5):
    LCS = 5 ('the cat on the mat'), P = 5/5 = 1, R = 5/6.
    F = (1+1.44)*1*(5/6) / (5/6 + 1.44*1) = (2.44*5/6) / (5/6 + 1.44)."""
    p, r, b2 = 1.0, 5.0 / 6.0, 1.2 ** 2
    expect = (1 + b2) * p * r / (r + b2 * p)
    got = rouge_l([["the cat sat on the mat"]], ["the cat on the mat"])
    assert got == pytest.approx(expect, abs=1e-12)


def test_rouge_l_perfect_and_disjoint():
    assert rouge_l([["a b c"]], ["a b c"]) == pytest.approx(1.0)
    assert rouge_l([["a b c"]], ["x y z"]) == 0.0


# ---------------------------------------------------------------- CIDEr-D

def test_cider_d_perfect_match_is_ten():
    """The pycocoevalcap scale convention: a perfect corpus scores exactly
    10.0 (the scorer's internal ×10; papers print ×100 ⇒ 1000). The two
    documents share no n-grams, so every idf = log(2) - log(1) > 0 and each
    hyp/ref cosine is exactly 1 with zero length penalty."""
    refs = [["a b c d e"], ["v w x y z"]]
    hyps = ["a b c d e", "v w x y z"]
    assert cider_d(refs, hyps) == pytest.approx(10.0, abs=1e-12)


def test_cider_d_hand_derived_partial():
    """Two 2-token documents (only n=1,2 contribute; n=3,4 give empty hyp
    vectors ⇒ sim 0). Corpus: refs ['a b'], ['c d']; hyps 'a x', 'c d'.

    N=2 docs. Every ref unigram/bigram has df=1 ⇒ idf = log2 - log1 = log2.
    Sample 1 (ref 'a b', hyp 'a x'):
      n=1: ref vec {a:log2, b:log2}, hyp vec {a:log2, x: 1*(log2 - log(max(0→1)))
           = log2} (x unseen: df 0 → log(max(0,1))=0 ⇒ idf log2).
           CIDEr-D clips hyp counts to ref: num = min(log2,log2)*log2 = log2².
           norms: |h| = |r| = sqrt(2)·log2 ⇒ sim = log2²/(2·log2²) = 1/2.
           len penalty: e^0 = 1 (both length 2). score_1 += 0.5.
      n=2: hyp bigram 'a x' ∉ ref ⇒ num 0 ⇒ sim 0.
      sample total = 10 · (0.5 + 0 + 0 + 0)/4 = 1.25.
    Sample 2 (ref 'c d', hyp 'c d'): perfect ⇒ 10 · (1+1+0+0)/4 = 5.0
      (n=3,4: EMPTY hyp n-gram vectors ⇒ sim 0 — 2-token sentences).
    Corpus mean = (1.25 + 5.0)/2 = 3.125."""
    refs = [["a b"], ["c d"]]
    hyps = ["a x", "c d"]
    assert cider_d(refs, hyps) == pytest.approx(3.125, abs=1e-12)


# ---------------------------------------------------------------- METEOR

def test_meteor_perfect_match_penalty():
    """METEOR's published scoring function at our documented parameters
    (alpha=0.9, beta=3, gamma=0.5 — PARITY.md D1): perfect 3-token match has
    fmean = 1, one chunk, frag = 1/3 ⇒ score = 1 - 0.5·(1/3)³ = 1 - 1/54."""
    got = meteor_lite([["the cat sat"]], ["the cat sat"])
    assert got == pytest.approx(1.0 - 0.5 * (1.0 / 3.0) ** 3, abs=1e-12)


def test_meteor_hand_derived_partial():
    """ref 'the cat sat on the mat' (6), hyp 'the cat on the mat' (5):
    all 5 hyp tokens match in order; alignment (0,0),(1,1),(2,3),(3,4),(4,5)
    breaks once after 'cat' ⇒ 2 chunks. P = 1, R = 5/6,
    fmean = PR/(0.9P + 0.1R) = (5/6)/(0.9 + 0.1·5/6),
    penalty = 0.5·(2/5)³ = 0.032."""
    p, r = 1.0, 5.0 / 6.0
    fmean = p * r / (0.9 * p + 0.1 * r)
    expect = fmean * (1.0 - 0.5 * (2.0 / 5.0) ** 3)
    got = meteor_lite([["the cat sat on the mat"]], ["the cat on the mat"])
    assert got == pytest.approx(expect, abs=1e-12)


def test_meteor_stem_stage_recovers_inflections():
    """The Porter-stem stage must align serve/serves/serving (the D1 claim
    that inflection matches dominate the tennis vocabulary — tested, not
    prose): exact-only would score 3/4 matches here, the stem stage all 4."""
    ref = [["player serves the ball"]]
    exact_only = meteor_lite(ref, ["player smash the ball"])  # 3 exact
    stemmed = meteor_lite(ref, ["player serving the ball"])   # 3 exact + stem
    assert stemmed > exact_only
    # serving→serv aligns with serves→serv: a single 4-token chunk, P=R=1
    assert stemmed == pytest.approx(1.0 - 0.5 * (1.0 / 4.0) ** 3, abs=1e-12)


# ---------------------------------------------------------------- BLEU

def test_bleu_hand_derived_corpus():
    """Corpus BLEU (mteval-13a formulation, no smoothing) through the suite:
    single doc, ref 'a b c d', hyp 'a b c x'.
    p1 = 3/4, p2 = 2/3, p3 = 1/2, p4 = 0 ⇒ Bleu_4 = 0;
    Bleu_2 = sqrt(p1·p2); BP = 1 (equal lengths)."""
    suite = nlg_metric_suite([["a b c d"]], ["a b c x"])
    assert suite["Bleu_1"] == pytest.approx(0.75, abs=1e-12)
    assert suite["Bleu_2"] == pytest.approx(math.sqrt(0.75 * 2 / 3), abs=1e-12)
    assert suite["Bleu_3"] == pytest.approx(
        (0.75 * (2 / 3) * 0.5) ** (1 / 3), abs=1e-12)
    assert suite["Bleu_4"] == 0.0


def test_suite_scale_invariants():
    """Every suite metric sits on its documented scale (nlg.py contract):
    fractions except CIDEr (0-10). A perfect corpus pins the ceilings."""
    refs = [["player serves an ace"], ["a long rally ends"]]
    suite = nlg_metric_suite(refs, ["player serves an ace",
                                    "a long rally ends"])
    for n in range(1, 5):
        assert suite[f"Bleu_{n}"] == pytest.approx(1.0)
    assert suite["ROUGE_L"] == pytest.approx(1.0)
    assert suite["CIDEr"] == pytest.approx(10.0)
    assert 0.9 < suite["METEOR"] <= 1.0  # fragmentation penalty < 0.1
