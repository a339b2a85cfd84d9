"""Pre-resized frame cache (tennis_tpu.data.frame_cache) — build semantics,
incremental re-runs, dataset wiring with per-file fallback, and fidelity of
the cached read against the direct decode+resize path."""
import os

import cv2
import numpy as np
import pytest

from fixtures import build_fixture

from tennis_tpu.data import TennisSet
from tennis_tpu.data.frame_cache import (
    build_frame_cache, cache_dir, main as cache_main,
)
from tennis_tpu.data.tennis_set import _read_image_rgb, get_image_path
from tennis_tpu.data.transforms import test_geometry as _geometry

SHORT = 80  # cache short side; fixture frames are 128x160


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = build_fixture(tmp_path_factory.mktemp("ds"), img_hw=(128, 160))
    # one smooth frame for the fidelity check (noise frames JPEG badly)
    yy, xx = np.mgrid[0:128, 0:160].astype(np.float32)
    smooth = np.stack([yy * 2, xx, (yy + xx) / 2], -1).astype(np.uint8)
    cv2.imwrite(get_image_path(os.path.join(str(r), "frames"), "V900", 0),
                cv2.cvtColor(smooth, cv2.COLOR_RGB2BGR))
    return str(r)


@pytest.fixture(scope="module")
def built(root):
    written, skipped = build_frame_cache(root, SHORT, workers=2)
    return written, skipped


def test_build_mirrors_every_frame(root, built):
    written, skipped = built
    src = os.path.join(root, "frames")
    n_src = sum(len(files) for _, _, files in os.walk(src))
    n_dst = sum(len(files) for _, _, files in os.walk(cache_dir(root, SHORT)))
    assert written == n_src == n_dst
    assert skipped == 0
    img = _read_image_rgb(get_image_path(cache_dir(root, SHORT), "V900", 0))
    assert min(img.shape[:2]) == SHORT


def test_rebuild_is_incremental(root, built):
    written, skipped = build_frame_cache(root, SHORT, workers=2)
    assert written == 0 and skipped == sum(built)
    # touching a source re-writes exactly that file
    src = get_image_path(os.path.join(root, "frames"), "V900", 3)
    os.utime(src)
    written, _ = build_frame_cache(root, SHORT, workers=2)
    assert written == 1


def test_cached_geometry_close_to_direct(root, built):
    """Cache built at data_shape+32 feeds test_geometry with only the JPEG
    re-encode between it and the direct path."""
    path = get_image_path(os.path.join(root, "frames"), "V900", 0)
    direct = _geometry(_read_image_rgb(path), SHORT - 32)
    cached = _geometry(
        _read_image_rgb(get_image_path(cache_dir(root, SHORT), "V900", 0)),
        SHORT - 32,
    )
    assert direct.shape == cached.shape
    diff = np.abs(direct.astype(np.int16) - cached.astype(np.int16))
    assert diff.mean() < 2.0, diff.mean()


def test_small_sources_copied_verbatim(root, tmp_path):
    """Sources at/below the target short side are file copies — no
    generation loss."""
    build_frame_cache(root, 256, workers=2)
    src = get_image_path(os.path.join(root, "frames"), "V900", 1)
    dst = get_image_path(cache_dir(root, 256), "V900", 1)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_source_exactly_at_target_copied_verbatim(root):
    """A source whose TRUE short side equals the target is a byte-copy, not a
    q95 re-encode (no generation loss): the at-target prescale ambiguity is
    resolved by the header-only source dims, not by re-encoding everything."""
    build_frame_cache(root, 128, workers=2)  # fixture frames are 128-short
    src = get_image_path(os.path.join(root, "frames"), "V900", 2)
    dst = get_image_path(cache_dir(root, 128), "V900", 2)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_prescale_landing_exactly_on_target_still_resizes(root):
    """A 2x-oversized source whose DCT prescale lands EXACTLY on the target
    (128-short fixture at --short 64: the native decoder's 4/8 scale returns
    a 64-short image) must be written at the target size — not mistaken for
    an already-small source and copied into the cache at full resolution."""
    build_frame_cache(root, 64, workers=2)
    img = _read_image_rgb(get_image_path(cache_dir(root, 64), "V900", 0))
    assert min(img.shape[:2]) == 64, img.shape
    # and it is a real re-encode, not a byte-copy of the 128-short original
    src = get_image_path(os.path.join(root, "frames"), "V900", 0)
    dst = get_image_path(cache_dir(root, 64), "V900", 0)
    assert open(src, "rb").read() != open(dst, "rb").read()


def test_dataset_reads_cache_with_fallback(root, built):
    ds = TennisSet(root=root, split="val", split_id="02", balance=False,
                   frames_cache=SHORT)
    img, _label, idx = ds[0]
    assert min(img.shape[:2]) == SHORT  # cache resolution
    # a missing cache file falls back to the original tree, resized to the
    # cache geometry so partial caches serve a single resolution
    video, frame = ds._samples[int(idx)][:2]
    os.remove(get_image_path(cache_dir(root, SHORT), video, frame))
    img2, _, _ = ds[0]
    assert img2.shape == img.shape
    build_frame_cache(root, SHORT, workers=2)  # restore for other tests


def test_partial_cache_keeps_windows_stackable(root, built):
    """A half-built cache must not mix resolutions inside a temporal window —
    the window stack requires every frame at one shape (regression: the
    fallback used to return the full-res original)."""
    ds = TennisSet(root=root, split="val", split_id="02", balance=False,
                   window=3, frames_cache=SHORT)
    video, frame = ds._samples[0][:2]
    frames = ds.window_frames(0)
    removed = get_image_path(cache_dir(root, SHORT), video, frames[1])
    os.remove(removed)
    try:
        imgs, _label, _idx = ds[0]
        assert imgs.shape[0] == 3
        assert min(imgs.shape[1:3]) == SHORT
    finally:
        build_frame_cache(root, SHORT, workers=2)


def test_flow_path_ignores_cache(root, built):
    """6-channel RGB+flow needs the on-disk pixel relationship (8-row crop);
    frames_cache must not engage there."""
    r = build_fixture(os.path.join(root, "..", "ds_flow"), img_hw=(64, 80),
                      with_flow=True)
    ds = TennisSet(root=str(r), split="val", split_id="02", balance=False,
                   flow=True, frames_cache=SHORT)
    assert ds._frames_cache_dir is None
    img, _, _ = ds[0]
    assert img.shape[-1] == 6


def test_cli_main(root, capsys):
    cache_main([f"--root={root}", f"--short={SHORT}", "--workers=2"])
    out = capsys.readouterr().out
    assert f"frames_s{SHORT}" in out and "up to date" in out
