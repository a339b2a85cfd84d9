import os

import numpy as np
import pytest

from tennis_tpu.data import TennisSet
from tennis_tpu.data.tennis_set import get_image_path
from tennis_tpu.utils.captioning import get_comp_str, read_sentences, \
    write_sentences
from tennis_tpu.utils.visualisation import visualise_events

from fixtures import build_fixture


def test_visualise_events_fake_scores(tmp_path):
    """The reference's self-test: render a video from random scores
    (reference utils/visualisation.py:78-98)."""
    root = build_fixture(tmp_path / "ds")
    ds = TennisSet(root=root, split="test", split_id="02", balance=False)
    rng = np.random.default_rng(0)
    results, gts = {}, {}
    for i in range(len(ds)):
        video, frame, cls = ds._samples[i]
        path = get_image_path(os.path.join(root, "frames"), video, frame)
        scores = rng.random(len(ds.classes))
        results[path] = scores / scores.sum()
        gts[path] = ds.classes.index(cls)

    out = visualise_events(ds, results, str(tmp_path / "fake.mp4"), gt=gts)
    assert os.path.exists(out) and os.path.getsize(out) > 1000

    import cv2

    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert n == len(results)
    # frame + banner + class legend (codecs may round odd heights to even)
    assert abs(h - (24 + 75 + 40)) <= 1


def test_visualise_requires_results(tmp_path):
    root = build_fixture(tmp_path / "ds")
    ds = TennisSet(root=root, split="test", split_id="02", balance=False)
    with pytest.raises(ValueError):
        visualise_events(ds, {}, str(tmp_path / "x.mp4"))


def test_sentence_io_roundtrip(tmp_path):
    sents = [["player", "serves"], ["a", "winner"]]
    path = str(tmp_path / "s.txt")
    write_sentences(sents, path)
    assert read_sentences(path) == sents
    write_sentences(["plain string"], path)
    assert read_sentences(path) == [["plain", "string"]]


def test_get_comp_str():
    s = get_comp_str([["a", "b"]], [["a", "c"]])
    assert "GT:\ta b" in s and "PD:\ta c" in s
