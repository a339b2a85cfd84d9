"""TenniSet dataset index and sample loader.

Reimplements the reference's ``dataset.py`` (``TennisSet``, reference dataset.py:17-494)
as a pure-Python/numpy index with the same on-disk conventions:

- ``<root>/splits/<split_id>/<split>.txt``       lines ``<video> <frame>``
- ``<root>/annotations/labels/<video>.txt``      lines ``<frame> <class>``
- ``<root>/annotations/points.txt``              lines ``<id> <video> <start> <end> <x>``
- ``<root>/annotations/captions.txt``            lines ``<id>\\t<caption>``
- frames/flow/features chunked as ``<dir>/<video>.mp4/<chunk:010d>/<frame:010d>.{jpg,npy}``
  with chunk = frame // 1000 * 1000 (reference dataset.py:136-150)

Samples are returned as numpy arrays (uint8 HWC images, float32 features); all device
math (normalize/augment) happens inside the jitted step, not here — the loader stays a
pure CPU indexing layer so the TPU input pipeline can ship uint8.

Deliberate behaviour changes vs the reference (documented):
- class balancing is **seeded** (the reference uses unseeded ``random.uniform``,
  dataset.py:282) so multi-host data sharding sees one agreed-on epoch sample list;
- missing frames raise by default instead of triggering in-band ffmpeg extraction
  (reference dataset.py:347-375); pass ``extract_missing=True`` for the old behaviour.
"""
from __future__ import annotations

import math
import os
from collections import OrderedDict

import numpy as np

CHUNK_SIZE = 1000

DEFAULT_CLASSES = [
    "OTH", "SFI", "SFF", "SFL", "SNI", "SNF", "SNL", "HFL", "HFR", "HNL", "HNR",
]


def load_classes(root: str = "data") -> list[str]:
    """Class list from ``<root>/classes.names`` (reference dataset.py:249-261), falling
    back to the canonical 11 TenniSet classes when the file is absent."""
    names_file = os.path.join(root, "classes.names")
    if os.path.exists(names_file):
        with open(names_file, "r") as f:
            return [line.strip() for line in f if line.strip()]
    return list(DEFAULT_CLASSES)


def get_image_path(root_dir, video_name, frame_number, chunk_size=CHUNK_SIZE):
    chunk = int(frame_number / chunk_size) * chunk_size
    return os.path.join(
        root_dir, video_name + ".mp4", f"{chunk:010d}", f"{frame_number:010d}.jpg"
    )


def get_feature_path(feat_dir, video_name, frame_number, chunk_size=CHUNK_SIZE):
    chunk = int(frame_number / chunk_size) * chunk_size
    return os.path.join(
        feat_dir, video_name + ".mp4", f"{chunk:010d}", f"{frame_number:010d}.npy"
    )


def _read_image_rgb(path: str, min_short: int | None = None) -> np.ndarray:
    """RGB uint8 read. JPEGs go through the native libjpeg path (bit-exact with
    cv2's decode, ~1.5× faster: direct RGB output skips the BGR intermediate,
    and ≥2× oversized sources decode at a SIMD-friendly 1/2^k DCT scale bounded
    by ``min_short``); anything else, or a missing native toolchain, falls back
    to cv2."""
    from tennis_tpu.native.jpeg import decode_jpeg_file

    img = decode_jpeg_file(path, min_short)
    if img is not None:
        return img
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class TennisSet:
    """Index over the TenniSet frames/labels/events/points/captions.

    Constructor surface mirrors reference dataset.py:17-19. ``__getitem__`` returns
    ``(img, label, idx)`` for classification — img is (H, W, C) uint8, (W, H, W, C)
    uint8 for window>1, or float32 features — and
    ``(imgs, cap_str, n_imgs, n_cap[, idx])`` for captioning
    (reference dataset.py:152-233).
    """

    def __init__(
        self,
        root="data",
        captions=False,
        transform=None,
        split="train",
        every=1,
        balance=True,
        padding=1,
        stride=1,
        window=1,
        model_id="0000",
        split_id="02",
        flow=False,
        max_cap_len=-1,
        vocab=None,
        inference=False,
        feats_model=None,
        save_feats=False,
        balance_seed: int = 0,
        extract_missing: bool = False,
        decode_short: int | None = None,
        frames_cache: int | None = None,
    ):
        self._root = root
        # decode JPEGs no smaller than this short side (drivers pass
        # data_shape+32, the test-geometry input size): ≥2× oversized sources
        # decode at a cheap DCT scale instead of full size
        self._decode_short = decode_short
        # pre-resized frames mirror (data/frame_cache.py): per-file fallback to
        # the original tree, and OFF for the 6-channel path — the flow concat's
        # 8-row crop needs the on-disk pixel relationship (see _load_frame)
        self._frames_cache_dir = None
        self._frames_cache_short = None
        if frames_cache and not flow:
            from tennis_tpu.data.frame_cache import cache_dir

            self._frames_cache_dir = cache_dir(root, int(frames_cache))
            self._frames_cache_short = int(frames_cache)
        self._captions = captions
        self._split = split
        self._balance = balance
        self._every = every
        self._padding = padding  # kept for flag parity (unused, as in the reference)
        self._stride = stride
        self._window = window
        self._transform = transform
        self._flow = flow
        self._inference = inference
        self._save_feats = save_feats
        self._extract_missing = extract_missing

        self._videos_dir = os.path.join(root, "videos")
        self._frames_dir = os.path.join(root, "frames")
        self._flow_dir = os.path.join(root, "flow")
        self._splits_dir = os.path.join(root, "splits")
        self._annotations_dir = os.path.join(root, "annotations")
        self._labels_dir = os.path.join(root, "annotations", "labels")
        self.output_dir = os.path.join(root, "outputs", model_id, split)
        self._load_feats = False
        self.feat_dir = os.path.join(root, "features", model_id)
        if feats_model is not None:
            self.feat_dir = os.path.join(root, "features", feats_model)
            self._load_feats = True

        self.classes = load_classes(root)

        self._samples, self._videos, self._events, self._points = self._load_data(
            split_id
        )
        self._video_lengths = self._get_video_lengths()

        if self._captions:
            self._samples = list(self._points.keys())
            caps = [p[4] for p in self._points.values()]
            if vocab is None:
                from tennis_tpu.data.vocab import captions_vocab

                self.vocab = captions_vocab(caps)
            else:
                self.vocab = vocab
            for point_id in self._samples:
                cap = self._points[point_id][4]
                toks = cap.split()
                if max_cap_len >= 0:
                    toks = toks[:max_cap_len]
                cap_ids = self.vocab[toks]
                cap_ids.insert(0, self.vocab[self.vocab.bos_token])
                cap_ids.append(self.vocab[self.vocab.eos_token])
                self._points[point_id].append(np.asarray(cap_ids, dtype=np.int32))
        elif self._balance:
            self._samples = self._balance_classes(balance_seed)

    # ------------------------------------------------------------------ loading

    def _load_data(self, split_id):
        splits_file = os.path.join(self._splits_dir, split_id, self._split + ".txt")
        if not os.path.exists(splits_file):
            raise FileNotFoundError(
                f"Split file {splits_file} does not exist; cannot load dataset."
            )
        with open(splits_file, "r") as f:
            samples = [
                [line.split()[0], int(line.split()[1])] for line in f if line.strip()
            ]

        videos = list(OrderedDict.fromkeys(s[0] for s in samples))
        labels = {v: {} for v in videos}

        if self._save_feats:
            # extend ±255 frames past each video's sample range so temporal models have
            # context features at event boundaries (reference dataset.py:333-345)
            for v in videos:
                frames = [s[1] for s in samples if s[0] == v]
                min_f, max_f = min(frames), max(frames)
                for i in range(1, 256):
                    samples.append([v, min_f - i])
                    samples.append([v, max_f + i])
                    labels[v][min_f - i] = "OTH"
                    labels[v][max_f + i] = "OTH"

        # existence check; optionally extract from source videos, else drop
        # (progress-reported like the reference's tqdm scan, dataset.py:347-354
        # — split-02 train stats ~572K frame paths)
        from tennis_tpu.utils import Progress

        missing = [
            s
            for s in Progress.wrap(samples, f"scanning {self._split} frames",
                                   unit="frames", interval=30.0)
            if not os.path.exists(get_image_path(self._frames_dir, s[0], s[1]))
        ]
        if missing and self._extract_missing:
            from tennis_tpu.data.video import video_to_frames

            for v in videos:
                video_to_frames(
                    video_path=os.path.join(self._videos_dir, v + ".mp4"),
                    frames_dir=self._frames_dir,
                    chunk_size=CHUNK_SIZE,
                )
            missing = [
                s
                for s in samples
                if not os.path.exists(get_image_path(self._frames_dir, s[0], s[1]))
            ]
        if missing:
            missing_set = {(s[0], s[1]) for s in missing}
            samples = [s for s in samples if (s[0], s[1]) not in missing_set]

        for v in videos:
            with open(os.path.join(self._labels_dir, v + ".txt"), "r") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        labels[v][int(parts[0])] = parts[1]

        in_set = {v: [] for v in videos}
        for s in samples:
            s.append(labels[s[0]][s[1]])
            in_set[s[0]].append(s[1])

        # events = maximal runs of equal class label over the sorted in-split frames
        # (reference dataset.py:396-411, including its quirk that the first run starts
        # as 'OTH')
        events = []
        for v in videos:
            cur_class = "OTH"
            start_frame = -1
            last_frame = -1
            for frame in sorted(in_set[v]):
                if start_frame < 0:
                    start_frame = frame
                    last_frame = frame
                if labels[v][frame] != cur_class:
                    events.append([v, start_frame, last_frame, cur_class])
                    cur_class = labels[v][frame]
                    start_frame = frame
                last_frame = frame
            events.append([v, start_frame, last_frame, cur_class])

        points_dict = {}
        points_path = os.path.join(self._annotations_dir, "points.txt")
        caps_path = os.path.join(self._annotations_dir, "captions.txt")
        if os.path.exists(points_path) and os.path.exists(caps_path):
            with open(points_path, "r") as f:
                points = [l.split() for l in f if l.strip()]
            caps = {}
            with open(caps_path, "r") as f:
                for l in f:
                    parts = l.rstrip("\n").split("\t")
                    if len(parts) >= 2:
                        caps[parts[0]] = parts[1]
            for p in points:
                p.append(caps[p[0]])
            in_set_sets = {v: set(f) for v, f in in_set.items()}
            for p in points:
                if p[1] in in_set_sets and int(p[2]) in in_set_sets[p[1]]:
                    points_dict[p[0]] = p[1:]

        return samples, videos, events, points_dict

    def _get_video_lengths(self):
        """Largest extracted frame number per video, from the chunked frames layout
        (reference dataset.py:439-455)."""
        lengths = {}
        for sample in self._samples:
            v = sample[0]
            if v in lengths:
                continue
            vdir = os.path.join(self._frames_dir, v + ".mp4")
            if not os.path.isdir(vdir):
                # features-only runs may have no frames dir; fall back to sample range
                lengths[v] = max(s[1] for s in self._samples if s[0] == v)
                continue
            chunks = sorted(d for d in os.listdir(vdir) if d.isdigit())
            # walk back over empty trailing chunk dirs: video_to_frames
            # pre-creates the final chunk dir but (reference total-1 quirk)
            # can leave it empty when total % chunk_size == 1
            for chunk in reversed(chunks):
                files = sorted(os.listdir(os.path.join(vdir, chunk)))
                if files:
                    lengths[v] = int(os.path.splitext(files[-1])[0])
                    break
            else:
                raise FileNotFoundError(f"no extracted frames under {vdir}")
        return lengths

    # ------------------------------------------------------------------ balancing

    def _balance_classes(self, seed: int):
        """Downsample 'OTH' so it matches the next-most-frequent class in expectation
        (reference dataset.py:268-287), with a seeded RNG for determinism."""
        counts = self.class_counts()
        next_most = max(counts[1:])
        ratio = next_most / float(counts[0] + 1)
        rng = np.random.default_rng(seed)
        balanced = []
        for sample in self._samples:
            if sample[2] == "OTH" and rng.uniform(0.0, 1.0) > ratio:
                continue
            balanced.append(sample)
        return balanced

    def class_counts(self):
        counts = [0] * len(self.classes)
        index = {c: i for i, c in enumerate(self.classes)}
        for s in self._samples:
            counts[index[s[2]]] += 1
        return counts

    @property
    def num_class(self):
        return len(self.classes)

    def __len__(self):
        return len(self._samples)

    # ------------------------------------------------------------------ sampling

    def _load_frame(self, video, frame):
        if self._load_feats:
            return np.load(get_feature_path(self.feat_dir, video, frame))
        # the 6-channel path needs full-res frames: the 8-row crop below and the
        # RGB/flow concat assume the on-disk pixel relationship, which a DCT
        # decode scale would break
        min_short = None if self._flow else self._decode_short
        path = get_image_path(self._frames_dir, video, frame)
        cache_miss_short = None
        if self._frames_cache_dir is not None:
            cached = get_image_path(self._frames_cache_dir, video, frame)
            if os.path.exists(cached):
                path = cached
            else:
                # per-file fallback must match the cache's geometry, or a
                # partially built cache mixes resolutions inside one temporal
                # window and the window stack fails
                cache_miss_short = self._frames_cache_short
        img = _read_image_rgb(path, min_short)
        if cache_miss_short is not None and min(img.shape[:2]) > cache_miss_short:
            from tennis_tpu.data.transforms import resize_shorter

            img = resize_shorter(img, cache_miss_short)
        if self._flow:
            flw = _read_image_rgb(get_image_path(self._flow_dir, video, frame))
            # flow images are 4×-upscaled from quarter-res inference and 16 px shorter;
            # the reference crops 8 rows top+bottom of the RGB before the 6-ch concat
            # (reference dataset.py:212,228)
            img = np.concatenate([img[8:-8], flw], axis=-1)
        return img

    def _max_every_frame(self, video):
        """Largest frame index that is a multiple of ``every`` (reference
        dataset.py:195-200)."""
        max_frame = self._video_lengths[video] - self._every
        for i in range(self._every):
            if (max_frame - i) % self._every == 0:
                max_frame -= i
                break
        return max_frame

    def window_frames(self, idx):
        """Frame numbers of the temporal window for sample ``idx`` (classification)."""
        sample = self._samples[idx]
        offsets = range(int(-self._window / 2), int(math.ceil(self._window / 2)))
        max_frame = self._max_every_frame(sample[0])
        return [
            min(max(0, sample[1] + o * self._stride), int(max_frame)) for o in offsets
        ]

    def __getitem__(self, idx):
        if self._captions:
            point_id = self._samples[idx]
            point = self._points[point_id]
            vid, start, end = point[0], int(point[1]), int(point[2])
            cap = point[5]
            imgs = []
            for c, f in enumerate(range(start, end)):
                if c % self._every == 0:
                    img = self._load_frame(vid, f)
                    if self._transform is not None:
                        img = self._transform(img)
                    imgs.append(img)
            imgs = np.stack(imgs)
            if self._inference:
                return imgs, cap, len(imgs), len(cap), idx
            return imgs, cap, len(imgs), len(cap)

        sample = self._samples[idx]
        label = self.classes.index(sample[2])
        if self._window > 1:
            imgs = []
            for frame in self.window_frames(idx):
                img = self._load_frame(sample[0], frame)
                if self._transform is not None:
                    img = self._transform(img)
                imgs.append(img)
            img = np.stack(imgs)
        else:
            img = self._load_frame(sample[0], sample[1])
            if self._transform is not None:
                img = self._transform(img)
        return img, label, idx

    # ------------------------------------------------------------------ captions API

    def get_captions(self, ids=False, split=False):
        caps = []
        for point_id in self._samples:
            cap = self._points[point_id][5 if ids else 4]
            caps.append(cap.split() if split and not ids else cap)
        return caps

    def get_data_lens(self):
        """(n_frames, n_caption_tokens) per point, for bucketing (reference
        dataset.py:235-247)."""
        assert self._captions
        lens = []
        for point_id in self._samples:
            point = self._points[point_id]
            start, end = int(point[1]), int(point[2])
            cap_ids = point[5]
            lens.append((int((end - start + 1) / self._every), len(cap_ids)))
        return lens

    def save_feature_path(self, idx, chunk_size=CHUNK_SIZE):
        sample = self._samples[idx]
        return get_feature_path(self.feat_dir, sample[0], sample[1], chunk_size)

    def calc_flow_mean_std(self, every: int = 100):
        """Mean/std of the flow channels over every ``every``-th sample
        (reference dataset.py:480-494); used to derive the TwoStream statistics."""
        assert self._flow
        sums = np.zeros(3)
        stds = np.zeros(3)
        count = 0
        for i in range(0, len(self), every):
            img = self[i][0]
            flow = img[..., 3:].astype(np.float64) / 256.0
            sums += flow.mean(axis=(0, 1))
            stds += flow.std(axis=(0, 1))
            count += 1
        return tuple(sums / count) + tuple(stds / count)

    def save_sample(self, idx, output_dir=None):
        """Copy a sample's frame into the outputs tree (reference
        dataset.py:457-478)."""
        import cv2

        sample = self._samples[idx]
        img_path = get_image_path(self._frames_dir, sample[0], sample[1])
        save_path = get_image_path(output_dir or self.output_dir, sample[0],
                                   sample[1])
        img = cv2.imread(img_path)
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        cv2.imwrite(save_path, img)
        return save_path

    # ------------------------------------------------------------------ reporting

    def stats(self):
        out = f"Split: {self._split}\n"
        if self._captions:
            points = len(self._samples)
            frames = sum(
                int(self._points[s][2]) - int(self._points[s][1])
                for s in self._samples
            )
            out += "{0: <8} {1: <8} {2: <5}\n".format("# Points", "# Frames", "FperP")
            out += "{0: <8} {1: <8} {2: <5}\n".format(
                points, frames, int(frames / max(points, 1))
            )
        else:
            frame_counts = self.class_counts()
            event_counts = [0] * len(self.classes)
            index = {c: i for i, c in enumerate(self.classes)}
            for e in self._events:
                event_counts[index[e[3]]] += 1
            out += "{0: <6} {1: <8} {2: <8} {3: <5}\n".format(
                "Class", "# Frames", "# Events", "FperE"
            )
            for i, c in enumerate(self.classes):
                out += "{0: <6} {1: <8} {2: <8} {3: <5}\n".format(
                    c,
                    frame_counts[i],
                    event_counts[i],
                    int(frame_counts[i] / (event_counts[i] + 1e-5)),
                )
        return out

    def __str__(self):
        return "\n\n" + self.__class__.__name__ + "\n" + self.stats() + "\n"
