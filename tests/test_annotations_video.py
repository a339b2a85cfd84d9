import json
import os

import numpy as np
import pytest

from tennis_tpu.data.annotations import (
    count_end_swaps,
    generalise_jsons,
    generate_labels,
    generate_points_list,
    generate_slices,
    player_position,
    stroke_side,
)


def _toy_db():
    """One set, two games; Federer (right-handed) starts near vs Nadal (left)."""
    return {
        "classes": {
            "USE": [{"start": 0, "end": 200}],
            "Set": [{"start": 0, "end": 200, "custom": {"Score": "1-0",
                                                        "Near": "Federer"}}],
            "Game": [
                {"start": 0, "end": 100, "custom": {"Score": "1-0",
                                                    "Winner": "Federer"}},
                {"start": 100, "end": 200, "custom": {"Score": "1-1",
                                                      "Winner": "Nadal"}},
            ],
            "Point": [
                {"start": 10, "end": 40, "name": "pt1",
                 "custom": {"Score": "15-0"}},
                # second game: score sum 1-0 → one swap → ends switched
                {"start": 110, "end": 140, "name": "pt2",
                 "custom": {"Score": "0-15"}},
            ],
            "Serve": [
                {"start": 12, "end": 18, "custom": {"Player": "Federer",
                                                    "Result": "In"}},
                {"start": 112, "end": 118, "custom": {"Player": "Nadal",
                                                      "Result": "Fault"}},
            ],
            "Hit": [
                {"start": 20, "end": 26, "custom": {"Player": "Nadal",
                                                    "Side": "Forehand"}},
                {"start": 120, "end": 126, "custom": {"Player": "Federer",
                                                      "Side": "Backhand"}},
            ],
        }
    }


def test_count_end_swaps():
    assert count_end_swaps("0-0", "0-0", "15-0") == 0
    assert count_end_swaps("0-0", "1-0", "15-0") == 0
    assert count_end_swaps("0-0", "1-1", "30-0") == 1
    assert count_end_swaps("1-1", "3-2", "Game") == 2
    # tiebreak at 6-6 within a live set: extra swap every 6 points
    assert count_end_swaps("0-0", "6-7", "6-1") == 6 + 1
    assert count_end_swaps("0-0", "6-7", "3-2") == 6 + 0
    # final set (sum >= MAX_SETS) never counts tiebreak swaps
    assert count_end_swaps("3-2", "6-7", "6-1") == 6
    # first point of a tiebreak: the reference's int((0-1)/6) truncates toward
    # zero → 0 extra swaps; floor division would flip parity to -1 here
    assert count_end_swaps("0-0", "6-7", "0-0") == 6 + 0


def test_player_position_parity():
    assert player_position("Federer", "Federer", swaps=0) == "Near"
    assert player_position("Federer", "Federer", swaps=1) == "Far"
    assert player_position("Nadal", "Federer", swaps=0) == "Far"
    assert player_position("Nadal", "Federer", swaps=1) == "Near"


def test_stroke_side_hander_table():
    # right-hander near: forehand on camera right (reference preprocess.py:256-260)
    assert stroke_side("Federer", "Near", "Forehand") == "Right"
    assert stroke_side("Federer", "Near", "Backhand") == "Left"
    assert stroke_side("Federer", "Far", "Forehand") == "Left"
    # left-hander mirrors
    assert stroke_side("Nadal", "Near", "Forehand") == "Left"
    assert stroke_side("Nadal", "Far", "Forehand") == "Right"


def test_full_annotation_pipeline(tmp_path):
    ann = tmp_path / "ann"
    os.makedirs(ann)
    with open(ann / "V777.json", "w") as f:
        json.dump(_toy_db(), f)

    assert generate_slices(str(ann), str(tmp_path / "slices"), ["V777"]) == 1
    with open(tmp_path / "slices" / "V777.txt") as f:
        assert f.read().strip() == "0 200"

    assert generalise_jsons(str(ann), str(tmp_path / "gen"), ["V777"]) == 1
    with open(tmp_path / "gen" / "V777.json") as f:
        g = json.load(f)
    serves = g["classes"]["Serve"]
    hits = g["classes"]["Hit"]
    # game 1 (0 swaps): Federer near serving In → Near/In; Nadal far forehand →
    # left-hander far forehand = camera Right
    assert serves[0]["custom"]["Player"] == "Near"
    assert hits[0]["custom"] == {"Player": "Far", "Side": "Right"}
    # game 2 (1 swap): Nadal now far→near? Nadal started far, 1 swap → Near
    assert serves[1]["custom"]["Player"] == "Near"
    assert hits[1]["custom"]["Player"] == "Far"
    # Federer far backhand (right-hander far): Backhand → Right
    assert hits[1]["custom"]["Side"] == "Right"

    generate_labels(str(tmp_path / "gen"), str(tmp_path / "labels"), ["V777"])
    labels = {}
    with open(tmp_path / "labels" / "V777.txt") as f:
        for line in f:
            frame, cls = line.split()
            labels[int(frame)] = cls
    assert len(labels) == 200
    assert labels[12] == "SNI"      # Federer near serve in
    assert labels[20] == "HFR"      # Nadal far forehand → right
    assert labels[112] == "SNF"     # Nadal near serve fault
    assert labels[120] == "HFR"     # Federer far backhand → right
    assert labels[50] == "OTH"


def test_points_list():
    pts = generate_points_list(_toy_db())
    assert pts[0][:3] == ["1-0", "1-0", "15-0"]
    assert pts[1][:3] == ["1-0", "1-1", "0-15"]


def test_frames_to_video_roundtrip(tmp_path):
    import cv2

    from tennis_tpu.data.video import extract_frames, frames_to_video

    frames = tmp_path / "frames"
    os.makedirs(frames / "clip" / "0000000000")
    rng = np.random.default_rng(0)
    for i in range(10):
        img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(frames / "clip" / "0000000000" / f"{i:010d}.jpg"), img)

    video_path = frames_to_video(str(frames / "clip"), str(tmp_path / "out"))
    assert video_path and os.path.exists(video_path)

    # extract back
    out_dir = tmp_path / "reframes"
    n = extract_frames(video_path, str(out_dir), start=0, end=10)
    assert n == 10
    saved = os.listdir(out_dir / "out.mp4" / "0000000000")
    assert len(saved) == 10 and "0000000000.jpg" in saved


def test_video_to_frames_chunking(tmp_path):
    import cv2

    from tennis_tpu.data.video import video_to_frames

    # build a tiny 12-frame video
    path = str(tmp_path / "v.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    for i in range(12):
        writer.write(np.full((32, 48, 3), i * 20, np.uint8))
    writer.release()

    out = video_to_frames(path, str(tmp_path / "frames"), chunk_size=5,
                          max_workers=2)
    assert out is not None
    chunks = sorted(os.listdir(out))
    assert chunks == ["0000000000", "0000000005", "0000000010"]
    total = sum(len(os.listdir(os.path.join(out, c))) for c in chunks)
    assert total >= 11  # last chunk end is total-1 (reference quirk kept)


def test_find_point_empty_points_is_a_clear_error():
    from tennis_tpu.data.annotations import _find_point

    with pytest.raises(ValueError, match="no Point events"):
        _find_point([], 10, 20, "V999")


def test_process_cli_skip_flow(tmp_path):
    """python -m tennis_tpu.data.process --root <r> --skip_flow extracts
    frames from <root>/videos without touching flow."""
    import os

    from tennis_tpu.data.process import main as process_main
    from tennis_tpu.data.video import frames_to_video

    # build one tiny source video from fixture-style frames
    import cv2
    import numpy as np

    src = tmp_path / "videos"
    src.mkdir()
    frames_dir = tmp_path / "srcframes" / "x"
    frames_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(12):
        cv2.imwrite(str(frames_dir / f"{i:010d}.jpg"),
                    rng.integers(0, 255, (32, 48, 3)).astype(np.uint8))
    mp4 = frames_to_video(str(frames_dir), str(src / "V777.mp4"), fps=5)
    assert mp4 is not None

    process_main(["--root", str(tmp_path), "--videos", "V777", "--skip_flow"])
    out = tmp_path / "frames" / "V777.mp4"
    assert out.is_dir()
    assert any(f.endswith(".jpg") for _, _, fs in os.walk(out) for f in fs)
    assert not (tmp_path / "flow").exists()
