import os

import numpy as np
import pytest

from tennis_tpu.data import TennisSet, Vocab
from tennis_tpu.data.tennis_set import get_feature_path, get_image_path

from fixtures import CLASSES, POINTS, VIDEO_EVENTS, build_fixture, frame_label


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return build_fixture(tmp_path_factory.mktemp("tenniset"), with_flow=True)


def test_chunked_path_scheme():
    p = get_image_path("data/frames", "V006", 12345)
    assert p == os.path.join(
        "data/frames", "V006.mp4", "0000012000", "0000012345.jpg"
    )
    f = get_feature_path("data/features/0006", "V006", 999)
    assert f.endswith(os.path.join("V006.mp4", "0000000000", "0000000999.npy"))


def test_classification_sample(root):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False)
    assert ds.classes == CLASSES
    assert len(ds) == 80  # 40 frames x 2 videos
    img, label, idx = ds[0]
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8
    assert 0 <= label < len(CLASSES)
    # label must equal the fixture's ground truth for this sample
    video, frame, cls = ds._samples[0]
    assert CLASSES[label] == frame_label(video, frame) == cls


def test_events_derived_as_runs(root):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False)
    v900 = [e for e in ds._events if e[0] == "V900"]
    # train split covers frames 0..39 of V900: OTH(0-19), SFI(20-25), OTH(26-39)
    assert [e[3] for e in v900] == ["OTH", "SFI", "OTH"]
    assert v900[0][1] == 0 and v900[1][1] == 20 and v900[1][2] == 25


def test_balancing_downsamples_oth_deterministically(root):
    ds1 = TennisSet(root=root, split="train", split_id="02", balance=True)
    ds2 = TennisSet(root=root, split="train", split_id="02", balance=True)
    assert [s[:2] for s in ds1._samples] == [s[:2] for s in ds2._samples]
    counts = ds1.class_counts()
    full = TennisSet(root=root, split="train", split_id="02", balance=False)
    assert counts[0] < full.class_counts()[0]
    # non-OTH counts untouched
    assert counts[1:] == full.class_counts()[1:]


def test_window_clamps_at_video_bounds(root):
    ds = TennisSet(
        root=root, split="train", split_id="02", balance=False, window=5, stride=2
    )
    img, label, _ = ds[0]  # first sample: frame 0 → negative offsets clamp to 0
    assert img.shape == (5, 24, 32, 3)
    frames = ds.window_frames(0)
    assert frames[0] == 0 and frames[1] == 0  # clamped
    assert frames == sorted(frames)


def test_flow_six_channel_concat(root):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False, flow=True)
    img, _, _ = ds[0]
    # rgb rows cropped by 8 top+bottom: 24-16 = 8 rows, 6 channels
    assert img.shape == (8, 32, 6)


def test_captions_mode(root):
    ds = TennisSet(root=root, split="train", split_id="02", captions=True)
    train_points = [p for p in POINTS if p[2] < 40]  # start frame in train range
    assert len(ds) == len(train_points)
    imgs, cap, n_imgs, n_cap, = ds[0][:4]
    pid = ds._samples[0]
    point = dict((p[0], p) for p in POINTS)[pid]
    assert n_imgs == point[3] - point[2]
    # __getitem__ returns the caption as token ids (reference dataset.py:159,181-183)
    np.testing.assert_array_equal(cap, ds._points[pid][5])
    assert n_cap == len(point[5].split()) + 2
    assert imgs.shape == (n_imgs, 24, 32, 3)
    # cap ids: bos + tokens + eos
    cap_ids = ds._points[pid][5]
    assert cap_ids[0] == ds.vocab[ds.vocab.bos_token]
    assert cap_ids[-1] == ds.vocab[ds.vocab.eos_token]
    assert len(cap_ids) == len(point[5].split()) + 2


def test_captions_every_and_maxlen(root):
    ds = TennisSet(
        root=root, split="train", split_id="02", captions=True, every=2, max_cap_len=3
    )
    imgs, _, n_imgs, _ = ds[0][:4]
    pid = ds._samples[0]
    point = dict((p[0], p) for p in POINTS)[pid]
    assert n_imgs == (point[3] - point[2] + 1) // 2
    cap_ids = ds._points[pid][5]
    assert len(cap_ids) == 3 + 2
    lens = ds.get_data_lens()
    assert lens[0] == (n_imgs, len(cap_ids))


def test_captions_shared_vocab(root):
    train = TennisSet(root=root, split="train", split_id="02", captions=True)
    val = TennisSet(
        root=root, split="val", split_id="02", captions=True, vocab=train.vocab,
        inference=True,
    )
    assert val.vocab is train.vocab
    if len(val):
        out = val[0]
        assert len(out) == 5  # inference returns idx too


def test_vocab_gluonnlp_ordering():
    from collections import Counter

    v = Vocab(Counter({"bb": 3, "aa": 3, "cc": 5, "dd": 1}))
    assert v.idx_to_token[:4] == ["<unk>", "<pad>", "<bos>", "<eos>"]
    # freq desc, ties alphabetical
    assert v.idx_to_token[4:] == ["cc", "aa", "bb", "dd"]
    assert v["zz"] == 0  # unknown
    assert v[["cc", "dd"]] == [4, 7]


def test_save_feats_extends_boundaries(root):
    ds = TennisSet(
        root=root, split="val", split_id="02", balance=False, save_feats=True
    )
    # val covers frames 40..49; ±255 extension exists only where frames exist on disk
    frames_v900 = sorted(s[1] for s in ds._samples if s[0] == "V900")
    assert frames_v900[0] < 40  # extended below the split range
    assert frames_v900[-1] >= 49


def test_stats_strings(root):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False)
    s = ds.stats()
    assert "OTH" in s and "# Frames" in s
    dsc = TennisSet(root=root, split="train", split_id="02", captions=True)
    assert "# Points" in dsc.stats()
