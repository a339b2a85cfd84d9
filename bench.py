"""Headline benchmark: DenseNet121 per-frame feature extraction, frames/sec/chip.

This is the reference pipeline's throughput-critical stage (``--save_feats`` dumping
4096-d features at 512², reference train.py:530-545) and the driver's north-star
metric ("≥10× MXNet frames/sec/chip on v5e feature extraction").

Setup: FrameModel(DenseNet121) feature path at 512×512, bf16 compute, NHWC, uint8
input with the fused on-device uint8→normalize stage (tennis_tpu.data.transforms).

Timing protocol: this environment reaches the TPU through a tunnel where
``block_until_ready`` does not actually synchronize, so N forward passes run inside
ONE jitted ``lax.fori_loop`` whose input is loop-carried (XLA cannot hoist or elide
any iteration) and the measurement barrier is a single scalar fetch to host. The
~30 ms tunnel round-trip is removed by differencing two loop lengths.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use an
estimated 100 frames/sec/GPU for MXNet/cuDNN DenseNet121 inference at 512² on
reference-era hardware (≈30 GFLOPs/frame; concat-heavy DenseNet ran at ~0.1 of peak
on MXNet-era GPUs). ``vs_baseline`` = measured / 100.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

MXNET_BASELINE_FPS = 100.0  # documented estimate, see module docstring
DATA_SHAPE = 512
BATCH_CANDIDATES = (128, 256)
N_SHORT, N_LONG = 2, 12


def main():
    import jax
    import jax.numpy as jnp

    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import FrameModel, get_backbone

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    model = FrameModel(get_backbone("densenet121", dtype=jnp.bfloat16),
                       dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    # init MUST be jitted: eager init round-trips per op over the TPU tunnel
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, DATA_SHAPE, DATA_SHAPE, 3), jnp.bfloat16)
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def extract_n(variables, images_u8, n):
        """n chained feature extractions; each iteration's input is perturbed by the
        loop counter so nothing hoists, and the scalar accumulator carries a data
        dependency through every iteration."""

        def body(i, acc):
            imgs = images_u8 + i.astype(jnp.uint8)  # loop-dependent input
            feats = model.apply(variables, device_prepare(imgs), train=False)
            return acc + jnp.sum(feats.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(batch, n, images):
        tic = time.perf_counter()
        acc = float(extract_n(variables, images, n))  # fetch = true barrier
        dt = time.perf_counter() - tic
        assert np.isfinite(acc)
        return dt

    best_fps, best_batch = 0.0, 0
    for batch in BATCH_CANDIDATES:
        images = jax.device_put(
            np.random.default_rng(0).integers(
                0, 255, (batch, DATA_SHAPE, DATA_SHAPE, 3), dtype=np.uint8
            )
        )
        try:
            timed(batch, N_SHORT, images)  # compile both loop lengths
            timed(batch, N_LONG, images)
            t_short = timed(batch, N_SHORT, images)
            t_long = timed(batch, N_LONG, images)
        except Exception as e:  # e.g. OOM at large batch
            print(f"# batch {batch} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        # difference removes the fixed dispatch/fetch overhead
        fps = batch * (N_LONG - N_SHORT) / max(t_long - t_short, 1e-9)
        print(
            f"# batch {batch}: {fps:.1f} frames/sec "
            f"(t_short={t_short:.3f}s t_long={t_long:.3f}s)",
            file=sys.stderr,
        )
        if fps > best_fps:
            best_fps, best_batch = fps, batch

    result = {
        "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
        "value": round(best_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(best_fps / MXNET_BASELINE_FPS, 2),
        "batch": best_batch,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
