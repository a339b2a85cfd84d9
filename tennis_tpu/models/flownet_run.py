"""Optical-flow generation over frame directories.

Rebuild of the reference's flow pipeline (reference models/vision/flownet/
run.py:13-140 and utils.py:8-251): adjacent frame pairs → center-crop to /64 →
mean-subtract normalise → FlowNetS → middlebury colour image → 4× bilinear
upscale → write mirrored directory tree.

TPU-native difference: the reference infers one pair at a time on GPU
(run.py:73-84, batch=1). Here pairs are batched per device call
(``--flow_batch``), so the conv stack sees MXU-sized batches, and the host
decode/encode pipeline overlaps device compute.
"""
from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7


# ------------------------------------------------------------------ pre/post


def crop_to_64(img: np.ndarray) -> np.ndarray:
    """Centre crop so both sides divide by 64 (reference utils.py:8-23)."""
    h, w = img.shape[:2]
    th, tw = (h // 64) * 64, (w // 64) * 64
    if th == h and tw == w:
        return img
    return img[(h - th) // 2 : (h + th) // 2, (w - tw) // 2 : (w + tw) // 2]


def normalise_pair(imgs: np.ndarray) -> np.ndarray:
    """(2, H, W, 3) uint8 → mean-subtracted /255 float32 (reference
    utils.py:26-38; the mean is per channel over both frames)."""
    imgs = imgs.astype(np.float32)
    mean = imgs.mean(axis=(0, 1, 2), keepdims=True)
    return (imgs - mean) / 255.0


# --------------------------------------------------------- middlebury colours


def make_color_wheel() -> np.ndarray:
    """Middlebury colour wheel (55 entries; reference utils.py:41-88)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[col : col + RY, 0] = 255
    wheel[col : col + RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = None


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Flow components → RGB via the colour wheel (reference utils.py:91-133)."""
    global _WHEEL
    if _WHEEL is None:
        _WHEEL = make_color_wheel()
    wheel = _WHEEL
    ncols = wheel.shape[0]

    nan_mask = np.isnan(u) | np.isnan(v)
    u, v = np.where(nan_mask, 0, u), np.where(nan_mask, 0, v)

    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = np.where(k0 + 1 == ncols + 1, 1, k0 + 1)
    f = fk - k0

    img = np.zeros(u.shape + (3,), np.uint8)
    for c in range(3):
        col0 = wheel[k0 - 1, c] / 255.0
        col1 = wheel[k1 - 1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col = np.where(idx, 1 - rad * (1 - col), col * 0.75)
        img[..., c] = np.uint8(np.floor(255 * col * (1 - nan_mask)))
    return img


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow → RGB visualisation (reference utils.py:213-251)."""
    u, v = flow[..., 0].copy(), flow[..., 1].copy()
    idx_unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (
        np.abs(v) > UNKNOWN_FLOW_THRESH
    )
    u[idx_unknown] = 0
    v[idx_unknown] = 0
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(-1.0, float(rad.max()) if rad.size else -1.0)
    eps = np.finfo(float).eps
    img = compute_color(u / (maxrad + eps), v / (maxrad + eps))
    img[idx_unknown] = 0
    return img


# --------------------------------------------------------------- .flo format


def write_flo(path: str, flow: np.ndarray) -> None:
    """Middlebury .flo writer (reference utils.py:136-166)."""
    with open(path, "wb") as f:
        np.array([202021.25], np.float32).tofile(f)
        h, w = flow.shape[:2]
        np.array([w, h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flo(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, 1)[0]
        assert abs(magic - 202021.25) < 1e-3, f"bad .flo magic in {path}"
        w, h = np.fromfile(f, np.int32, 2)
        return np.fromfile(f, np.float32, int(w) * int(h) * 2).reshape(h, w, 2)


# ----------------------------------------------------------------- inference


class FlowRunner:
    """Batched FlowNetS inference over frame pairs."""

    def __init__(self, params=None, params_path=None, batch_size: int = 8,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp

        from tennis_tpu.models.flownet import FlowNetS

        self.model = FlowNetS()
        self.batch_size = batch_size
        self._jax = jax
        if params is not None:
            self.variables = {"params": params}
        elif params_path and os.path.exists(params_path):
            dummy = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(seed), dummy)
            if params_path.endswith(".npz"):
                # converted torch FlowNet2-S weights (models/convert.py
                # convert_torch_flownets; the reference loads a torch-ported
                # checkpoint the same way, models/vision/flownet/README.md)
                from tennis_tpu.models.convert import inject_npz

                params_t = jax.device_get(dict(variables["params"]))
                params_t, _, n = inject_npz(params_t, {}, dict(np.load(params_path)))
                if n == 0:
                    raise ValueError(
                        f"no arrays in {params_path} matched FlowNetS"
                    )
                self.variables = {"params": params_t}
            else:
                from tennis_tpu.utils import checkpoint as ckpt

                self.variables = ckpt.load_state(params_path, variables)
        else:
            dummy = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy
            )
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def flow_batch(self, pairs: np.ndarray) -> np.ndarray:
        """(N, 2, H, W, 3) uint8 pairs → (N, H/4, W/4, 2) flow."""
        batch = np.stack([normalise_pair(p) for p in pairs])
        return np.asarray(self._jax.device_get(
            self._apply(self.variables, batch)
        ))

    def process_pair(self, files: Sequence[str]):
        """Two image paths → (flow RGB image ×4 upscale, raw flow) — the
        reference's process_two_images surface (run.py:13-48)."""
        import cv2

        imgs = []
        for path in files[:2]:
            img = cv2.imread(path)
            if img is None:
                return None, None
            imgs.append(crop_to_64(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)))
        flow = self.flow_batch(np.stack(imgs)[None])[0]
        img = flow_to_image(flow)
        img = cv2.resize(img, (img.shape[1] * 4, img.shape[0] * 4),
                         interpolation=cv2.INTER_LINEAR)
        return img, flow


def process_video(input_path: str, output_path=None, params_path=None,
                  batch_size: int = 8, fps: int = 30):
    """Video file → flow-visualisation video (reference run.py:89-133): decode
    frames, run adjacent-pair flow in device batches, write an mp4 of the colour
    images."""
    import cv2

    cap = cv2.VideoCapture(input_path)
    frames = []
    while True:
        ret, img = cap.read()
        if not ret or img is None:
            if len(frames) and not ret:
                break
            if len(frames) > 500:
                break
            continue
        frames.append(crop_to_64(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)))
    cap.release()
    if len(frames) < 2:
        print(f"{input_path}: not enough frames for flow")
        return None

    runner = FlowRunner(params_path=params_path, batch_size=batch_size)
    if output_path is None:
        output_path = os.path.splitext(input_path)[0] + "_flow.mp4"
    h, w = frames[0].shape[:2]
    video = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                            (w, h))
    pairs = [np.stack([frames[i - 1], frames[i]]) for i in range(1, len(frames))]
    for start in range(0, len(pairs), batch_size):
        flows = runner.flow_batch(np.stack(pairs[start : start + batch_size]))
        for flow in flows:
            img = flow_to_image(flow)
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
            video.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    video.release()
    return output_path


def generate_flows(image_dir: str, flow_dir: str = "flow", params_path=None,
                   batch_size: int = 8) -> None:
    """Recursive adjacent-pair flow generation mirroring the input tree
    (reference run.py:51-86,136-140), batched per device call."""
    import cv2

    files = []
    for ext in (".jpg", ".png", ".jpeg", ".JPG", ".PNG", ".JPEG"):
        files = glob.glob(image_dir + "/**/*" + ext, recursive=True)
        if files:
            break
    if not files:
        print(f"Couldn't find any files in {image_dir}")
        return None
    files.sort()

    runner = FlowRunner(params_path=params_path, batch_size=batch_size)

    pending = []  # (pair_paths, out_path)
    for i in range(1, len(files)):
        d, name = os.path.split(files[i])
        if int(os.path.splitext(name)[0]) == 0:
            continue  # first frame of a video has no predecessor (run.py:76-77)
        out_dir = d.replace(os.path.normpath(image_dir),
                            os.path.normpath(flow_dir))
        pending.append(((files[i - 1], files[i]), os.path.join(out_dir, name)))

    from tennis_tpu.utils import Progress

    progress = Progress(len(pending), f"flow {image_dir}", unit="pairs")
    for start in range(0, len(pending), batch_size):
        chunk = pending[start : start + batch_size]
        imgs = []
        for (a, b), _ in chunk:
            pa = crop_to_64(cv2.cvtColor(cv2.imread(a), cv2.COLOR_BGR2RGB))
            pb = crop_to_64(cv2.cvtColor(cv2.imread(b), cv2.COLOR_BGR2RGB))
            imgs.append(np.stack([pa, pb]))
        flows = runner.flow_batch(np.stack(imgs))
        for flow, (_, out_path) in zip(flows, chunk):
            img = flow_to_image(flow)
            img = cv2.resize(img, (img.shape[1] * 4, img.shape[0] * 4),
                             interpolation=cv2.INTER_LINEAR)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            cv2.imwrite(out_path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        progress.update(len(chunk))
    progress.close()
