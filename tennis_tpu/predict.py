"""Standalone streaming inference on a raw broadcast video (beyond-parity tool).

The reference can only score frames that already live inside a TenniSet
directory tree with split/label files (reference evaluate.py:78-270); turning a
new video into predictions requires hand-building that scaffolding first. This
driver closes that gap for production use: point it at an .mp4 and a trained
experiment and it streams frames straight off the decoder into the batched
jitted classifier, then writes an events timeline — no dataset, annotations, or
splits needed.

Outputs under ``--out_dir`` (default ``predictions/<video stem>``):

- ``probabilities.npy`` — (N, num_classes) softmax per sampled frame
- ``frames.txt``        — the source frame index of each row
- ``events.tsv``        — run-length events: start/end frame, class, mean prob
  (the same maximal-equal-label-run rule the dataset layer uses to derive
  events from per-frame labels, reference dataset.py:396-411)
- ``results.mp4``       — optional ``--vis`` overlay via the event visualiser

Run: ``python -m tennis_tpu.predict --video match.mp4 --model_id 0006
--backbone DenseNet121 --every 5``
"""
from __future__ import annotations

import os
import time

import sys

import numpy as np
from absl import flags, logging

# module-local namespace: the flag names overlap the vision drivers', which
# define them on the GLOBAL FlagValues (same rule as train_gnmt.py)
FLAGS = flags.FlagValues()

flags.DEFINE_string("video", None, "Input video file", flag_values=FLAGS)
flags.DEFINE_string("root", "data", "Dataset root (classes.names lookup only)",
                    flag_values=FLAGS)
flags.DEFINE_string("model_id", "0000", "Experiment id holding the checkpoint",
                    flag_values=FLAGS)
flags.DEFINE_string("backbone", "DenseNet121", "Backbone CNN name",
                    flag_values=FLAGS)
flags.DEFINE_string("out_dir", None,
                    "Output directory (default predictions/<video stem>)",
                    flag_values=FLAGS)
flags.DEFINE_integer("every", 1, "Classify every nth frame", lower_bound=1,
                     flag_values=FLAGS)
flags.DEFINE_integer("batch_size", 64, "Inference batch size",
                     flag_values=FLAGS)
flags.DEFINE_integer("data_shape", 512, "Input crop side", flag_values=FLAGS)
flags.DEFINE_integer("max_frames", -1, "Stop after this many sampled frames",
                     flag_values=FLAGS)
flags.DEFINE_bool("vis", False, "Write the results.mp4 overlay video",
                  flag_values=FLAGS)
flags.DEFINE_integer("vis_fps", 30, "Overlay video frame rate",
                     flag_values=FLAGS)


def label_runs(labels: np.ndarray, frame_ids: np.ndarray,
               probs: np.ndarray | None = None):
    """Maximal runs of equal class label → [(start, end, cls, mean_prob)].

    Same rule the dataset layer uses to derive events from per-frame labels
    (reference dataset.py:396-411: consecutive equal labels merge; a run spans
    [first, last] source frame of its members).
    """
    events = []
    start = 0
    for i in range(1, len(labels) + 1):
        if i == len(labels) or labels[i] != labels[start]:
            conf = float(probs[start:i, labels[start]].mean()) \
                if probs is not None else float("nan")
            events.append((int(frame_ids[start]), int(frame_ids[i - 1]),
                           int(labels[start]), conf))
            start = i
    return events


def _stream_batches(video_path: str, every: int, batch: int, data_shape: int,
                    max_frames: int, frames_dir: str | None):
    """Yield (uint8 [batch, S, S, 3], frame_id list, n_valid) straight off the
    decoder; the final batch is edge-padded (last frame repeated) to the
    static shape and the consumer drops the pad rows via n_valid. frame ids
    stay a plain list so the device prefetch leaves them on the host. With
    ``frames_dir``, also writes each sampled full-size frame to disk (the
    overlay path needs the original pixels)."""
    import cv2

    from tennis_tpu.data.transforms import test_geometry

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {video_path}")
    imgs, ids = [], []
    n_seen = 0
    frame_idx = -1
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        frame_idx += 1
        if frame_idx % every:
            continue
        if frames_dir is not None:
            cv2.imwrite(os.path.join(frames_dir, f"{frame_idx:010d}.jpg"), bgr)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        imgs.append(test_geometry(rgb, data_shape))
        ids.append(frame_idx)
        n_seen += 1
        if len(imgs) == batch:
            yield np.stack(imgs), ids, batch
            imgs, ids = [], []
        if 0 < max_frames <= n_seen:
            break
    cap.release()
    if imgs:
        n = len(imgs)
        pad = batch - n
        imgs.extend([imgs[-1]] * pad)
        ids.extend([ids[-1]] * pad)
        yield np.stack(imgs), ids, n


def predict():
    from tennis_tpu.data.loader import prefetch_to_device
    from tennis_tpu.inference import load_classifier
    from tennis_tpu.utils.tunnel import ensure_live_backend

    if not FLAGS.video:
        raise ValueError("--video is required")
    if not ensure_live_backend():
        # tunneled TPU registration hangs (not errors) when the tunnel is
        # down; run on CPU rather than wedging a production inference job
        logging.warning("TPU tunnel unreachable — falling back to CPU")
    stem = os.path.splitext(os.path.basename(FLAGS.video))[0]
    out_dir = FLAGS.out_dir or os.path.join("predictions", stem)
    os.makedirs(out_dir, exist_ok=True)
    frames_dir = None
    if FLAGS.vis:
        frames_dir = os.path.join(out_dir, "frames")
        os.makedirs(frames_dir, exist_ok=True)

    # best epoch into the shared jitted scorer (tennis_tpu/inference.py),
    # placed on device once (load_state contract)
    classes, predict_probs, _info = load_classifier(
        FLAGS.backbone, FLAGS.model_id, FLAGS.data_shape, FLAGS.root)

    tic = time.time()
    all_probs, all_ids = [], []
    # decode/geometry overlaps device compute (loader-side prefetch thread);
    # ids are a plain list and n an int, so only the image array is device_put
    for images, ids, n in prefetch_to_device(_stream_batches(
            FLAGS.video, FLAGS.every, FLAGS.batch_size, FLAGS.data_shape,
            FLAGS.max_frames, frames_dir)):
        all_probs.append(predict_probs(images)[:n])
        all_ids.append(np.asarray(ids[:n], np.int64))
    if not all_probs:
        raise ValueError(f"no frames decoded from {FLAGS.video}")
    probs = np.concatenate(all_probs)
    frame_ids = np.concatenate(all_ids)
    rate = len(probs) / max(time.time() - tic, 1e-6)
    logging.info("%d frames classified, %.1f frames/sec end to end",
                 len(probs), rate)

    np.save(os.path.join(out_dir, "probabilities.npy"), probs)
    with open(os.path.join(out_dir, "frames.txt"), "w") as f:
        f.write("\n".join(str(i) for i in frame_ids) + "\n")
    labels = probs.argmax(axis=-1)
    events = label_runs(labels, frame_ids, probs)
    with open(os.path.join(out_dir, "events.tsv"), "w") as f:
        f.write("start\tend\tclass\tmean_prob\n")
        for s, e, c, p in events:
            f.write(f"{s}\t{e}\t{classes[c]}\t{p:.4f}\n")
    logging.info("wrote %d events to %s", len(events),
                 os.path.join(out_dir, "events.tsv"))

    if FLAGS.vis:
        from types import SimpleNamespace

        from tennis_tpu.utils.visualisation import visualise_events

        results = {
            os.path.join(frames_dir, f"{i:010d}.jpg"): probs[k]
            for k, i in enumerate(frame_ids)
        }
        shim = SimpleNamespace(classes=classes, _frames_dir=frames_dir)
        visualise_events(shim, results,
                         os.path.join(out_dir, "results.mp4"),
                         fps=FLAGS.vis_fps)
        logging.info("wrote %s", os.path.join(out_dir, "results.mp4"))
    return probs, frame_ids, events


def main(argv=None):
    # reset between in-process invocations: absl FlagValues keep previously
    # parsed values for flags the new argv doesn't mention
    FLAGS.unparse_flags()
    FLAGS(argv if argv is not None else sys.argv)
    return predict()


if __name__ == "__main__":
    main()
