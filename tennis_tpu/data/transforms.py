"""Image transforms, split TPU-first into a host stage and a device stage.

The reference applies gluon CPU transforms per frame inside DataLoader workers
(reference train.py:132-147: RandomResizedCrop(512) + flip + ColorJitter(0.4) +
RandomLighting(0.1) + Normalize for train; Resize(+32) + CenterCrop for test;
utils/transforms.py:4-19 TwoStreamNormalize for 6-channel RGB+flow).

Here the pipeline is split so the host does only uint8 geometry (cv2 SIMD decode /
resize / crop — cheap, and uint8 halves host→device traffic 4×) and everything
arithmetic — scale, flip, color jitter, PCA lighting, normalize — runs **on device,
fused by XLA into the model's first conv**:

    host:   decode → geometry (RandomResizedCrop | Resize+CenterCrop) → uint8 NHWC
    device: u8→f32 → flip/jitter/lighting (train, jax PRNG) → normalize → bf16

This is the "fused decode→resize→normalize input stage" of the north-star plan.
"""
from __future__ import annotations

import math
import threading

import numpy as np

import jax
import jax.numpy as jnp

# ImageNet statistics (reference train.py:138-147)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# flow-channel statistics (reference utils/transforms.py:6-7)
TWO_STREAM_MEAN = (0.485, 0.456, 0.406, 0.863, 0.871, 0.883)
TWO_STREAM_STD = (0.229, 0.224, 0.225, 0.098, 0.087, 0.095)

# ImageNet PCA lighting basis (alexnet convention), in [0,1] scale
_EIGVAL = np.array([0.2175, 0.0188, 0.0045], dtype=np.float32)
_EIGVEC = np.array(
    [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ],
    dtype=np.float32,
)


class ThreadLocalRng:
    """Per-thread numpy Generators for DataLoader transform closures.

    numpy Generators are not thread-safe, and the loader applies transforms
    from a ThreadPoolExecutor — one shared Generator can tear its state and
    correlate the augmentation draws. Each thread gets its own child generator
    spawned from one SeedSequence. Draws remain uncorrupted at any worker
    count; exact per-sample reproducibility additionally needs
    ``num_workers=1`` (the reference's gluon augmentation is entirely
    unseeded, so this is still strictly more deterministic).
    """

    def __init__(self, seed: int):
        self._seq = np.random.SeedSequence(seed)
        self._lock = threading.Lock()
        self._local = threading.local()

    def get(self) -> np.random.Generator:
        rng = getattr(self._local, "rng", None)
        if rng is None:
            with self._lock:
                child = self._seq.spawn(1)[0]
            rng = np.random.default_rng(child)
            self._local.rng = rng
        return rng


# --------------------------------------------------------------------- host stage


def resize_shorter(img: np.ndarray, size: int) -> np.ndarray:
    """Resize so the shorter side equals ``size`` (gluon ``Resize`` with
    keep_ratio semantics used before CenterCrop). cv2.resize is channelwise
    and handles the 6-channel RGB+flow stack directly (the 4-channel cap only
    applies to remap/warp)."""
    import cv2

    h, w = img.shape[:2]
    if h < w:
        new_h, new_w = size, max(1, round(w * size / h))
    else:
        new_h, new_w = max(1, round(h * size / w)), size
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    y0 = max(0, (h - size) // 2)
    x0 = max(0, (w - size) // 2)
    out = img[y0 : y0 + size, x0 : x0 + size]
    if out.shape[0] != size or out.shape[1] != size:  # undersized input: pad
        pad_h, pad_w = size - out.shape[0], size - out.shape[1]
        out = np.pad(out, ((0, pad_h), (0, pad_w), (0, 0)))
    return out


def random_resized_crop(
    img: np.ndarray,
    size: int,
    rng: np.random.Generator,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """Gluon/torchvision ``RandomResizedCrop``: random area+aspect crop → resize."""
    import cv2

    h, w = img.shape[:2]
    area = h * w
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            crop = img[y0 : y0 + ch, x0 : x0 + cw]
            return cv2.resize(crop, (size, size), interpolation=cv2.INTER_LINEAR)
    # fallback: center crop of the shorter side
    return cv2.resize(
        center_crop(img, min(h, w)), (size, size), interpolation=cv2.INTER_LINEAR
    )


def test_geometry(img: np.ndarray, data_shape: int) -> np.ndarray:
    """Resize(+32) + CenterCrop(data_shape) — reference train.py:143-147."""
    return center_crop(resize_shorter(img, data_shape + 32), data_shape)


def train_geometry(
    img: np.ndarray, data_shape: int, rng: np.random.Generator
) -> np.ndarray:
    return random_resized_crop(img, data_shape, rng)


# ------------------------------------------------------------------- device stage


def normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """(B, H, W, C) float in [0,1] → standardized. 6-channel input uses the
    two-stream statistics automatically."""
    c = x.shape[-1]
    if c == 6:
        mean, std = TWO_STREAM_MEAN, TWO_STREAM_STD
    m = jnp.asarray(mean[:c], x.dtype)
    s = jnp.asarray(std[:c], x.dtype)
    return (x - m) / s


def device_prepare(batch_u8, dtype=jnp.bfloat16):
    """Eval path: uint8 NHWC → normalized ``dtype``. Jit-fusable into the model."""
    x = batch_u8.astype(jnp.float32) / 255.0
    return normalize(x).astype(dtype)


def color_jitter_coeffs(fb, fc, fs, mean_luma, order):
    """Per-sample affine coefficients of brightness/contrast/saturation applied in
    a random order (mxnet ``RandomOrderAug``, backing gluon's RandomColorJitter —
    reference train.py:135-136).

    Every jitter op is affine in the pixels:
      brightness: x ← fb·x
      contrast:   x ← fc·x + (1-fc)·mean(luma(x))   (scalar per image; mxnet's
                  ContrastJitterAug uses the LUMA-weighted mean, not a gray mean)
      saturation: x ← fs·x + (1-fs)·luma(x)          (per pixel)
    so any composition is ``x ↦ a·x + b·luma(x) + s`` (luma weights sum to 1, hence
    luma is idempotent and fixes constants). The (a, b, s) triplets for all six
    orders are composed on (B,)-vectors and the sampled order selected per sample —
    exact order semantics at the cost of scalar math, with ONE elementwise image
    pass instead of three.

    Args: fb/fc/fs/mean_luma (B,) floats; order (B,) ints in [0, 6).
    Returns: (a, b, s) each (B,).
    """
    from itertools import permutations

    def brightness(a, b, s):
        return fb * a, fb * b, fb * s

    def contrast(a, b, s):
        return fc * a, fc * b, fc * s + (1.0 - fc) * ((a + b) * mean_luma + s)

    def saturation(a, b, s):
        return fs * a, fs * b + (1.0 - fs) * (a + b), s

    ops = (brightness, contrast, saturation)
    triplets = []
    for perm in permutations(range(3)):
        a = jnp.ones_like(fb)
        b = jnp.zeros_like(fb)
        s = jnp.zeros_like(fb)
        for i in perm:
            a, b, s = ops[i](a, b, s)
        triplets.append(jnp.stack([a, b, s], axis=-1))
    stacked = jnp.stack(triplets)  # (6, B, 3)
    idx = jnp.broadcast_to(order[None, :, None], (1,) + stacked.shape[1:])
    sel = jnp.take_along_axis(stacked, idx, axis=0)[0]  # (B, 3)
    return sel[:, 0], sel[:, 1], sel[:, 2]


def luma_of(x):
    """ITU-R 601 luma, (..., 3) → (..., 1); weights sum to 1."""
    return 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]


def device_augment(batch_u8, rng, dtype=jnp.bfloat16, jitter: float = 0.4,
                   lighting: float = 0.1):
    """Train path: uint8 NHWC (B, H, W, 3) → flip + color jitter (random
    per-sample op order) + PCA lighting + normalize, all batched with jax PRNG
    (reference train.py:133-141 semantics).

    Jitter factors are multiplicative, so applying them in [0,1] matches gluon's
    [0,255]-scale implementation exactly. Deviation (documented in PARITY.md):
    values are clipped to [0,1] once at the end, approximating gluon's uint8
    saturation between ops.
    """
    k_flip, k_b, k_c, k_s, k_l, k_order = jax.random.split(rng, 6)
    x = batch_u8.astype(jnp.float32) / 255.0
    B = x.shape[0]

    # horizontal flip, per sample
    do_flip = jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1))
    x = jnp.where(do_flip, x[:, :, ::-1, :], x)

    fb = 1.0 + jax.random.uniform(k_b, (B,), minval=-jitter, maxval=jitter)
    fc = 1.0 + jax.random.uniform(k_c, (B,), minval=-jitter, maxval=jitter)
    fs = 1.0 + jax.random.uniform(k_s, (B,), minval=-jitter, maxval=jitter)
    order = jax.random.randint(k_order, (B,), 0, 6)

    luma = luma_of(x)  # (B, H, W, 1)
    mean_luma = jnp.mean(luma, axis=(1, 2, 3))  # (B,)
    a, b, s = color_jitter_coeffs(fb, fc, fs, mean_luma, order)
    x = (a[:, None, None, None] * x + b[:, None, None, None] * luma
         + s[:, None, None, None])

    # PCA lighting noise
    alpha = jax.random.normal(k_l, (B, 3)) * lighting
    delta = (alpha * _EIGVAL[None, :]) @ _EIGVEC.T  # (B, 3)
    x = x + delta[:, None, None, :]

    x = jnp.clip(x, 0.0, 1.0)
    return normalize(x).astype(dtype)
