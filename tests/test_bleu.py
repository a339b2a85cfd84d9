import math

import pytest

from tennis_tpu.metrics import compute_bleu


def test_perfect_match():
    refs = [[["the", "cat", "sat", "on", "the", "mat"]]]
    hyp = [["the", "cat", "sat", "on", "the", "mat"]]
    bleu, precisions, bp, ref_len, trans_len = compute_bleu(refs, hyp)
    assert bleu == pytest.approx(1.0)
    assert all(p == pytest.approx(1.0) for p in precisions)
    assert bp == 1.0 and ref_len == trans_len == 6


def test_no_match():
    refs = [[["aa", "bb", "cc", "dd"]]]
    hyp = [["xx", "yy", "zz", "ww"]]
    bleu, precisions, _, _, _ = compute_bleu(refs, hyp)
    assert bleu == 0.0
    assert precisions[0] == 0.0


def test_hand_computed_unigram_bigram():
    # hyp: 5 tokens; ref clips "the" to 2.
    refs = [[["the", "cat", "is", "on", "the", "mat"]]]
    hyp = [["the", "the", "the", "cat", "mat"]]
    bleu, precisions, bp, ref_len, trans_len = compute_bleu(refs, hyp, max_n=2)
    # unigram: clipped matches = the(2) + cat(1) + mat(1) = 4 of 5
    assert precisions[0] == pytest.approx(4 / 5)
    # bigrams of hyp: (the,the)x2, (the,cat), (cat,mat); only (the,cat) in ref → 1/4
    assert precisions[1] == pytest.approx(1 / 4)
    assert bp == pytest.approx(math.exp(1 - 6 / 5))
    assert bleu == pytest.approx(math.exp((math.log(4 / 5) + math.log(1 / 4)) / 2) * bp)


def test_closest_ref_length_brevity():
    # two references with lengths 3 and 6; hyp length 4 → closest is 3 → bp = 1
    refs = [[["a", "b", "c"]], [["a", "b", "c", "d", "e", "f"]]]
    hyp = [["a", "b", "c", "d"]]
    _, _, bp, ref_len, trans_len = compute_bleu(refs, hyp)
    assert ref_len == 3 and trans_len == 4 and bp == 1.0


def test_smoothing_floor():
    refs = [[["a", "b"]]]
    hyp = [["a", "b"]]
    # 3-grams/4-grams impossible (len 2): unsmoothed → bleu 0, smoothed > 0
    bleu_raw, _, _, _, _ = compute_bleu(refs, hyp, max_n=4)
    bleu_smooth, precisions, _, _, _ = compute_bleu(refs, hyp, max_n=4, smooth=True)
    assert bleu_raw == 0.0
    assert precisions[2] == 0.0  # empty denominator stays 0 even smoothed
    assert bleu_smooth == 0.0  # because min precision is 0 (no trigrams at all)


def test_untokenized_13a():
    refs = [["The cat, sat."]]
    hyp = ["The cat, sat."]
    bleu, _, _, _, _ = compute_bleu(refs, hyp, tokenized=False, tokenizer="13a")
    assert bleu == pytest.approx(1.0)


def test_matches_nltk_corpus_bleu():
    nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
    refs_sets = [
        [["the", "quick", "brown", "fox", "jumps"]],
        [["over", "the", "lazy", "dog", "today"]],
    ]
    hyps = [
        ["the", "quick", "brown", "dog", "jumps"],
        ["over", "a", "lazy", "dog", "today"],
    ]
    ours, _, _, _, _ = compute_bleu([[r[0] for r in refs_sets]], hyps)
    theirs = nltk_bleu.corpus_bleu(refs_sets, hyps)
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_bpe_merge():
    refs = [[["nice", "dog"]]]
    hyp_bpe = [["ni@@", "ce", "dog"]]
    bleu, _, _, _, _ = compute_bleu(refs, hyp_bpe, bpe=True, max_n=2)
    assert bleu == pytest.approx(1.0)


def test_compound_split():
    refs = [[["rich-text", "format"]]]
    hyp = [["rich-text", "format"]]
    # both sides get ATAT-split; equality must be preserved
    bleu, _, _, _, _ = compute_bleu(refs, hyp, split_compound_word=True, max_n=2)
    assert bleu == pytest.approx(1.0)
