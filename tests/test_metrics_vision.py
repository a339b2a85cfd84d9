import numpy as np
import pytest

from tennis_tpu.metrics import PRF1, Accuracy, TopKAccuracy, confusion_matrix


CLASSES = ["OTH", "SFI", "SFF"]


def test_confusion_matrix_counts():
    labels = np.array([0, 0, 1, 2, 2, 2])
    preds = np.array([0, 1, 1, 2, 0, 2])
    mat = np.asarray(confusion_matrix(labels, preds, 3))
    expected = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 2]], dtype=np.float32)
    np.testing.assert_array_equal(mat, expected)


def test_confusion_matrix_from_logits():
    labels = np.array([0, 1])
    logits = np.array([[0.9, 0.1, 0.0], [0.1, 0.2, 0.7]])
    mat = np.asarray(confusion_matrix(labels, logits, 3))
    assert mat[0, 0] == 1 and mat[1, 2] == 1 and mat.sum() == 2


def test_prf1_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, size=500)
    preds = rng.integers(0, 3, size=500)

    m = PRF1(CLASSES)
    # stream in several chunks to exercise accumulation
    for i in range(0, 500, 123):
        m.update(labels[i : i + 123], preds[i : i + 123])
    scores = m.get_dict()

    p, r, f1, _ = sklearn.precision_recall_fscore_support(
        labels, preds, labels=[0, 1, 2], zero_division=0
    )
    for i, c in enumerate(CLASSES):
        assert scores[c + "_prec"] == pytest.approx(p[i], abs=1e-9)
        assert scores[c + "_rec"] == pytest.approx(r[i], abs=1e-9)
        assert scores[c + "_f1"] == pytest.approx(f1[i], abs=1e-6)
    assert scores["AVG_f1"] == pytest.approx(f1.mean(), abs=1e-6)
    assert scores["AVG_NB_f1"] == pytest.approx(f1[1:].mean(), abs=1e-6)


def test_prf1_zero_class_is_finite():
    m = PRF1(CLASSES)
    m.update(np.array([0, 0]), np.array([0, 0]))  # classes 1,2 never appear
    scores = m.get_dict()
    assert scores["SFI_f1"] == 0.0
    assert np.isfinite(scores["AVG_NB_f1"])


def test_accuracy_ignore_labels():
    labels = np.array([0, 0, 1, 2])
    preds = np.array([0, 1, 1, 1])
    acc = Accuracy()
    acc.update(labels, preds)
    assert acc.get()[1] == pytest.approx(2 / 4)

    acc_nb = Accuracy(ignore_labels=[0])  # only classes 1,2 count
    acc_nb.update(labels, preds)
    assert acc_nb.get()[1] == pytest.approx(1 / 2)

    acc_b = Accuracy(ignore_labels=[1, 2])  # only class 0 counts
    acc_b.update(labels, preds)
    assert acc_b.get()[1] == pytest.approx(1 / 2)


def test_topk_accuracy():
    labels = np.array([2, 0])
    scores = np.array([[0.5, 0.3, 0.2], [0.4, 0.6, 0.0]])
    top1 = TopKAccuracy(1)
    top1.update(labels, scores)
    assert top1.get()[1] == pytest.approx(0.0)
    top2 = TopKAccuracy(2)
    top2.update(labels, scores)
    assert top2.get()[1] == pytest.approx(0.5)
