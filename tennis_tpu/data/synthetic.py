"""Synthetic TenniSet fixture: a miniature dataset with the reference's on-disk
layout (frames/labels/splits/points/captions — reference dataset.py:302-437,
README.md:43-47), for exercising the data layer, the CLI drivers, and the
``tennis_tpu.parity --dry-run`` harness without any real media."""
from __future__ import annotations

import os

import numpy as np

CLASSES = ["OTH", "SFI", "SFF", "SFL", "SNI", "SNF", "SNL", "HFL", "HFR", "HNL", "HNR"]

# per-video frame label runs: (start, end_exclusive, class). The TEST range
# (frames 50-60) carries classes that also occur in TRAIN (frames 0-40:
# SFI/SNI/HNR) so the parity --dry-run's 1-stand-in-epoch models can score
# provably nonzero F1 there — a dry-run whose gate inputs are all 0.00 cannot
# catch value-plumbing bugs in the harvest→gate seam (round-4 lesson).
VIDEO_EVENTS = {
    # VAL (frames 40-50) also reuses train classes: scores.txt ranks epochs by
    # val AVG_NB_f1, and a val split whose non-background classes never occur
    # in train scores 0.0 at every epoch — best-epoch selection then ties to
    # the rawest checkpoint and the dry-run evaluations stay at 0.00 forever.
    "V900": [(0, 20, "OTH"), (20, 26, "SFI"), (26, 40, "OTH"), (40, 46, "SFI"),
             (46, 52, "OTH"), (52, 58, "SFI"), (58, 60, "OTH")],
    "V901": [(0, 10, "OTH"), (10, 16, "SNI"), (16, 30, "OTH"), (30, 36, "HNR"),
             (36, 44, "OTH"), (44, 56, "HNR"), (56, 60, "OTH")],
}

# Frame pixels are class-coded (a per-class base colour + noise, see
# build_fixture) so the mapping is learnable by a tiny model in a couple of
# epochs — the fixture exists to exercise machinery, and machinery that only
# ever sees 0.0-valued metrics is unexercised at its seams.
CLASS_RGB = {
    "OTH": (40, 40, 40),   "SFI": (220, 60, 60),  "SFF": (60, 220, 60),
    "SFL": (60, 60, 220),  "SNI": (220, 220, 60), "SNF": (220, 60, 220),
    "SNL": (60, 220, 220), "HFL": (160, 100, 40), "HFR": (100, 40, 160),
    "HNL": (40, 160, 100), "HNR": (230, 150, 150),
}

POINTS = [
    # id, video, start, end, extra-field, caption
    # train-split points (start frame < 40). Captions are stereotyped with
    # heavy token overlap so the dry-run's tiny GNMT stand-in can reach
    # nonzero test BLEU by memorising the formulae.
    ("p001", "V900", 18, 30, "x", "player serves an ace to the far side"),
    ("p002", "V900", 38, 48, "x", "a quick forehand winner down the line"),
    ("p003", "V901", 8, 18, "x", "player serves into the net"),
    ("p004", "V901", 28, 38, "x", "a long rally ends with a backhand error"),
    ("p010", "V900", 20, 28, "x", "player serves into the net"),
    ("p011", "V900", 2, 12, "x", "player serves an ace down the line"),
    ("p012", "V901", 20, 30, "x", "player serves into the net"),
    ("p013", "V901", 0, 8, "x", "player serves an ace to the far side"),
    # val-split points (start frame in [40, 50))
    ("p005", "V900", 42, 50, "x", "player serves an ace down the line"),
    ("p006", "V901", 44, 50, "x", "a forehand winner to the far side"),
    # test-split points (start frame in [50, 60))
    ("p007", "V900", 52, 58, "x", "player serves into the net again"),
    ("p008", "V901", 50, 56, "x", "player serves an ace to the far side"),
]


def frame_label(video: str, frame: int) -> str:
    for start, end, cls in VIDEO_EVENTS[video]:
        if start <= frame < end:
            return cls
    return "OTH"


def build_fixture(root, img_hw=(24, 32), with_flow: bool = False) -> str:
    import cv2

    root = str(root)
    os.makedirs(os.path.join(root, "splits", "02"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations", "labels"), exist_ok=True)

    with open(os.path.join(root, "classes.names"), "w") as f:
        f.write("\n".join(CLASSES) + "\n")

    rng = np.random.default_rng(7)
    h, w = img_hw
    for video, events in VIDEO_EVENTS.items():
        n_frames = events[-1][1]
        for frame in range(n_frames):
            base = np.array(CLASS_RGB[frame_label(video, frame)], np.float32)
            noise = rng.normal(0.0, 28.0, size=(h, w, 3))
            img = np.clip(base + noise, 0, 255).astype(np.uint8)
            dirs = ("frames", "flow") if with_flow else ("frames",)
            for d in dirs:
                chunk = frame // 1000 * 1000
                path = os.path.join(
                    root, d, video + ".mp4", f"{chunk:010d}", f"{frame:010d}.jpg"
                )
                os.makedirs(os.path.dirname(path), exist_ok=True)
                # flow fixtures are 16 rows shorter, like the real 4x-upscaled flow
                sub = img[: h - 16] if d == "flow" else img
                cv2.imwrite(path, cv2.cvtColor(sub, cv2.COLOR_RGB2BGR))
        with open(os.path.join(root, "annotations", "labels", video + ".txt"), "w") as f:
            for frame in range(n_frames):
                f.write(f"{frame} {frame_label(video, frame)}\n")

    # split 02: both videos contribute to all splits
    splits = {"train": (0, 40), "val": (40, 50), "test": (50, 60)}
    for split, (lo, hi) in splits.items():
        lines = []
        for video, events in VIDEO_EVENTS.items():
            n_frames = events[-1][1]
            for frame in range(lo, min(hi, n_frames)):
                lines.append(f"{video} {frame}")
        with open(os.path.join(root, "splits", "02", split + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    with open(os.path.join(root, "annotations", "points.txt"), "w") as f:
        for pid, video, start, end, extra, _cap in POINTS:
            f.write(f"{pid} {video} {start} {end} {extra}\n")
    with open(os.path.join(root, "annotations", "captions.txt"), "w") as f:
        for pid, _video, _start, _end, _extra, cap in POINTS:
            f.write(f"{pid}\t{cap}\n")

    return root
