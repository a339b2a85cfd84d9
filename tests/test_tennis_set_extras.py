import os

import numpy as np
import pytest

from tennis_tpu.data import TennisSet

from fixtures import build_fixture


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return build_fixture(tmp_path_factory.mktemp("tenniset"), with_flow=True)


def test_calc_flow_mean_std(root):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False,
                   flow=True)
    stats = ds.calc_flow_mean_std(every=10)
    assert len(stats) == 6
    means, stds = stats[:3], stats[3:]
    assert all(0.0 <= m <= 1.0 for m in means)
    assert all(0.0 <= s <= 0.6 for s in stds)


def test_save_sample(root, tmp_path):
    ds = TennisSet(root=root, split="train", split_id="02", balance=False)
    out = ds.save_sample(0, output_dir=str(tmp_path / "outputs"))
    assert os.path.exists(out)


def test_video_lengths_skip_empty_trailing_chunk(root, tmp_path):
    """video_to_frames can pre-create the final chunk dir and leave it empty
    (total % chunk_size == 1 with the reference's total-1 clamp); the dataset
    must walk back to the last populated chunk instead of crashing."""
    import shutil

    mirror = tmp_path / "ds"
    shutil.copytree(root, mirror)
    video = sorted(os.listdir(mirror / "frames"))[0]
    (mirror / "frames" / video / "0000009000").mkdir()

    ds = TennisSet(str(mirror), split="train", split_id="02", balance=False)
    assert len(ds) > 0  # constructor survived; lengths from populated chunks
