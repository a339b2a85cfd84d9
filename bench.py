"""Headline benchmark: DenseNet121 per-frame feature extraction, frames/sec/chip,
plus the full DenseNet121-512 training step (ms/step, samples/sec, TFLOP/s, MFU).

The extraction path is the reference pipeline's throughput-critical stage
(``--save_feats`` dumping 4096-d features at 512², reference train.py:530-545) and
the driver's north-star metric ("≥10× MXNet frames/sec/chip on v5e feature
extraction"). The train row is the reference's hot loop (train.py:404-431) through
the SAME make_train_step harness the production driver uses — fused uint8 augment,
SGD+momentum+wd, donated state.

Setup: FrameModel(DenseNet121) at 512×512, bf16 compute, NHWC, uint8 input with the
fused on-device uint8→normalize stage (tennis_tpu.data.transforms).

Timing protocol: this environment reaches the TPU through a tunnel where
``block_until_ready`` does not actually synchronize, so N forward passes run inside
ONE jitted ``lax.fori_loop`` whose input is loop-carried (XLA cannot hoist or elide
any iteration) and the measurement barrier is a single scalar fetch to host. The
~30 ms tunnel round-trip is removed by differencing two loop lengths.

Baseline: the reference publishes no throughput numbers (BASELINE.md). We use an
estimated 100 frames/sec/GPU for MXNet/cuDNN DenseNet121 inference at 512² on
reference-era hardware (≈30 GFLOPs/frame; concat-heavy DenseNet ran at ~0.1 of peak
on MXNet-era GPUs). ``vs_baseline`` = measured / 100. MFU is self-grounding:
achieved TFLOP/s (XLA's own cost analysis of the compiled program) over the v5e
bf16 peak (197 TFLOP/s/chip), so the estimated denominator is not the only anchor.

Output contract: the driver parses the LAST JSON line on stdout, under a hard
wall-clock budget. To make any prefix of the run a valid artifact, a
PROVISIONAL row (value 0.0 + explanatory error) flushes before the extraction
lead-in — host-side tracing/lowering the persistent cache cannot cover,
observed at 844 s on a 1-core box — then the headline extraction JSON line is
printed (and flushed) IMMEDIATELY after the extraction phase; richer
superseding lines follow in order of importance: the STATIC-UNROLL refine
first (cheap, improves the headline ~3.5%; round 4 lost it to the deadline
by running it last), then the END-TO-END pipeline row (production DataLoader
decoding real JPEGs into the same compiled extraction program — reuses
extract_n at n=1 so no extra compile, per-leg probes first and the full run
scaled to the measured rate, with an ``overlap`` attribution breakdown;
ESSENTIAL, never deadline-skipped), then the train samples/sec row (the
~230 s train compile is the long pole, and it goes ahead of BOTH
cost-analysis compiles — the mfu decorations matter less than the train
number; also never deadline-skipped), then the cost analyses. Per-phase
wall-times ride in every line from the headline on (``phase_times``). The
OPTIONAL phases are gated on a budget of optional-phase time
(BENCH_OPTIONAL_BUDGET_S, default 300 s — warm total is ~186 s) plus an
absolute wall backstop (BENCH_SOFT_DEADLINE_S, default 1200 s), so the script
exits 0 inside the driver's hard budget instead of being cut to rc=124
mid-compile; budgeting optional time separately means a cold-cache box's slow
MANDATORY compile (observed 648 s) no longer starves the ~80 s refine the
headline depends on. When the gate
skips a cost analysis, tflops/mfu fall back to the committed static-FLOPs
cache (.bench_flops.json, flops_source="cached" marks such rows) — live
timing × static flop count — instead of regressing to 0.0; a run that fits
the live analysis refreshes the cache. Candidates are pruned
to the measured winners from round 2 (extraction batch 128 beat 256: 1927 vs
1833 fps; train (128, "block") beat (96, None): 334 vs 278 samples/sec).
Measured warm-cache end to end: rc=0 in ~313 s with every phase run (round
5); under host-CPU contention the extraction lead time alone was observed at
440-648 s, which is what the optional-budget accounting absorbs. The persistent cache DOES hit across
processes (verified with jax_explain_cache_misses: a warm run writes nothing
new) — the residual ~190 s extraction / ~230 s train lead time is tracing +
MLIR lowering of the fori_loop programs and executable upload over the tunnel,
none of which the cache covers.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

MXNET_BASELINE_FPS = 100.0  # documented estimate, see module docstring
V5E_PEAK_TFLOPS = 197.0  # bf16 peak per chip
DATA_SHAPE = 512
BATCH_CANDIDATES = (128,)
N_SHORT, N_LONG = 2, 12
# Without remat, batch 128 exceeds HBM (19.3G of 15.75G); block-remat recomputes
# each dense block's chain in backward, fitting batch 128 (measured best: 334 vs
# 278 samples/sec at batch 96 no-remat, see README)
TRAIN_CANDIDATES = ((128, "block"),)
TRAIN_N_SHORT, TRAIN_N_LONG = 2, 8
_T0 = time.perf_counter()
# Optional phases (cost analyses, the static-unroll refine) are gated on a
# budget of OPTIONAL-PHASE time — NOT total wall clock. Round-5 lesson: the
# old wall-clock gate (470 s since process start) let a cold-cache box's
# 648 s MANDATORY extraction compile starve the ~80 s refine the headline
# depends on, even though every mandatory phase flushes its superseding JSON
# line immediately (so a later hard cut costs only the phases after it, never
# the artifact). Mandatory slowness therefore must not tax the optional
# budget; optional time is accounted separately via _mark(optional=True).
# SOFT_DEADLINE_S survives as an absolute backstop (raised 470 -> 1200 s):
# on a box so slow the mandatory phases alone ate 20 minutes, optional
# decorations shouldn't gamble with the driver's hard budget. Measured warm:
# refine 82.5 s + extract CA 33.6 s + train CA 69.4 s = 186 s optional total.
SOFT_DEADLINE_S = float(os.environ.get("BENCH_SOFT_DEADLINE_S", "1200"))
OPTIONAL_BUDGET_S = float(os.environ.get("BENCH_OPTIONAL_BUDGET_S", "300"))
_OPTIONAL_SPENT = [0.0]  # seconds spent in completed optional phases


def _have_time(phase: str, expected_s: float = 0.0) -> bool:
    """Gate an OPTIONAL phase on the optional-time budget (time already spent
    in optional phases plus this one's expected duration) and on the absolute
    wall backstop. Both include the phase's own expected duration: a ~60 s
    cost-analysis compile entered at deadline-1s would overrun the driver's
    hard budget (rc=124 mid-compile), the exact failure this gate prevents."""
    elapsed = time.perf_counter() - _T0
    if _OPTIONAL_SPENT[0] + expected_s >= OPTIONAL_BUDGET_S:
        print(f"# [{elapsed:7.1f}s] optional budget {OPTIONAL_BUDGET_S:.0f}s "
              f"(spent {_OPTIONAL_SPENT[0]:.0f}s) would pass during {phase} "
              f"(expected ~{expected_s:.0f}s): skipping it",
              file=sys.stderr, flush=True)
        return False
    if elapsed + expected_s >= SOFT_DEADLINE_S:
        print(f"# [{elapsed:7.1f}s] soft deadline {SOFT_DEADLINE_S:.0f}s "
              f"would pass during {phase} (expected ~{expected_s:.0f}s): "
              f"skipping it", file=sys.stderr, flush=True)
        return False
    return True


def _phase(msg: str) -> None:
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


# Committed cache of XLA flop counts, keyed by (program, shapes) descriptor.
# FLOPs are a STATIC property of the compiled program, so a count measured on
# any past run stays valid until the model code changes — the cache lets a
# slow-host run whose soft deadline skips the live cost-analysis compile still
# report tflops/mfu (observed regression it prevents: a 1-core box burning
# 445-844 s in host-side lowering, then deadline-skipping both cost analyses
# and shipping mfu=0.0). Rows carry flops_source="cached" for honesty; a run
# that DOES fit the live analysis refreshes the file.
_FLOPS_CACHE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_flops.json")


# Companion record of the last successful on-chip measurement: the outage and
# provisional artifacts quote it as context (clearly marked as PRIOR numbers),
# so those fallback rows stay current instead of drifting from hard-coded
# literals. Refreshed at the end of every run that measured a real value.
_LAST_RUN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


# Persistent XLA compile cache, repo-relative like the records above — a
# checkout at any other path must not silently miss the cache every run.
_JAX_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _last_recorded() -> dict:
    try:
        with open(_LAST_RUN_PATH) as f:
            row = json.load(f)
        # quote only positive measurements (a stored 0.0 is not a record)
        row = {k: v for k, v in row.items()
               if isinstance(v, (int, float)) and v > 0}
        if row.get("extraction_fps", 0) > 0:
            return row
    except Exception:
        pass
    # fallback: round-3 measured values
    return {"extraction_fps": 2358.0, "mfu": 0.355,
            "train_samples_per_sec": 334.5}


def _store_last_recorded(result: dict) -> None:
    """Persist the just-measured headline numbers for future fallback rows;
    best-effort, never fails the bench, never stores a zero run. MERGES into
    the existing record per field: a run whose train phase failed (or whose
    cost analysis was skipped without a cache hit) must not erase the
    last-known-good train/mfu numbers the fallback artifacts quote."""
    if result.get("value", 0) <= 0:
        return
    try:
        with open(_LAST_RUN_PATH) as f:
            row = json.load(f)
        if not isinstance(row, dict):
            row = {}
    except Exception:
        row = {}
    row["extraction_fps"] = result["value"]
    if result.get("mfu", 0) > 0:
        row["mfu"] = result["mfu"]
    train = result.get("train") or {}
    if train.get("samples_per_sec", 0) > 0:
        row["train_samples_per_sec"] = train["samples_per_sec"]
    try:
        tmp = _LAST_RUN_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(row, f)
            f.write("\n")
        os.replace(tmp, _LAST_RUN_PATH)
    except Exception as e:
        print(f"# last-run record write failed: {type(e).__name__}: {e}",
              file=sys.stderr)


def _cached_flops(key: str) -> float:
    try:
        with open(_FLOPS_CACHE_PATH) as f:
            return float(json.load(f).get(key, {}).get("flops", 0.0))
    except Exception:
        return 0.0


def _store_flops(key: str, flops: float) -> None:
    if not flops or flops <= 0:
        return
    try:
        try:
            with open(_FLOPS_CACHE_PATH) as f:
                data = json.load(f)
        except Exception:
            data = {}
        data[key] = {"flops": flops}
        tmp = _FLOPS_CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, _FLOPS_CACHE_PATH)
    except Exception as e:  # cache is best-effort; never fail the bench
        print(f"# flops cache write failed: {type(e).__name__}: {e}",
              file=sys.stderr)


def _flops_of(jitted, *args) -> float:
    """XLA's cost-analysis flop count for one call of the function; 0.0 when the
    backend does not expose it. Prefers the pre-compile (lowered) analysis —
    remat recompute is explicit in the jaxpr so it is counted either way, and
    skipping the standalone compile keeps the cold-cache run inside the driver
    budget — falling back to the compiled analysis."""
    try:
        lowered = jitted.lower(*args)
        flops = 0.0
        try:
            cost = lowered.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) if cost else 0.0
        except Exception:
            pass
        if not flops:  # axon backend: only the compiled analysis carries flops
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) if cost else 0.0
        return flops
    except Exception as e:
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)
        return 0.0


def measure_train(jax, jnp, publish=None):
    """Full training step (augment → DenseNet121 fwd/bwd → SGD update) through the
    production harness; returns ``(best_row, cost_fn)`` over batch candidates.

    ``publish(row)`` is called as soon as each candidate's TIMING lands — before
    any cost-analysis lowering — so a budget cut after the timed loops still
    leaves an artifact carrying samples/sec. ``cost_fn()`` runs the ~60 s
    cost-analysis compile of the winning candidate and returns the row with
    tflops/mfu filled in; the caller schedules it by priority/budget."""
    from tennis_tpu.data.transforms import device_augment
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import (
        create_train_state, make_mesh, make_train_step, sgd_with_schedule,
    )
    from tennis_tpu.parallel.mesh import tpu_compiler_options
    from tennis_tpu.parallel.sharding_rules import state_shardings

    from functools import partial

    mesh = make_mesh(num_data=1)
    opts = tpu_compiler_options(mesh)
    tx, _ = sgd_with_schedule(0.001)
    rng = jax.random.PRNGKey(0)

    best = None
    for batch, remat in TRAIN_CANDIDATES:
        model = FrameModel(
            get_backbone("densenet121", dtype=jnp.bfloat16, remat=remat),
            num_classes=11, dtype=jnp.bfloat16,
        )
        state = create_train_state(
            model, rng, jnp.zeros((1, DATA_SHAPE, DATA_SHAPE, 3), jnp.float32),
            tx, {"train": True}, mesh=mesh,
        )
        sh_state = state_shardings(mesh, state)
        # the step runs INSIDE train_n's jit; the wrapper carries the tuned
        # compiler options (they are only legal on the top-level jit)
        step = make_train_step(model, mesh=mesh, preprocess=device_augment,
                               rng_seed=7, state_sharding=sh_state,
                               compiler_options=None)

        # traced n: one compile for both timing loop lengths
        @partial(jax.jit, donate_argnums=(0,), compiler_options=opts)
        def train_n(state, images_u8, labels, n, step=step):
            def body(i, carry):
                state, acc = carry
                imgs = images_u8 + i.astype(jnp.uint8)  # loop-dependent input
                state, loss, _logits = step(state, imgs, labels)
                return state, acc + loss
            state, acc = jax.lax.fori_loop(0, n, body,
                                           (state, jnp.float32(0.0)))
            return state, acc

        r = np.random.default_rng(0)
        images = jax.device_put(r.integers(
            0, 255, (batch, DATA_SHAPE, DATA_SHAPE, 3), dtype=np.uint8))
        labels = jax.device_put(r.integers(0, 11, (batch,), dtype=np.int32))
        # abstract handles for the post-timing cost analysis (timing donates the
        # real state buffers; lowering needs only shapes/dtypes)
        sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (state, images, labels),
        )
        try:
            def timed(n):
                nonlocal state
                tic = time.perf_counter()
                state, acc = train_n(state, images, labels, jnp.int32(n))
                acc = float(acc)  # fetch = true barrier
                assert np.isfinite(acc)
                return time.perf_counter() - tic

            timed(TRAIN_N_SHORT)  # the single compile
            _phase(f"train batch {batch}: compile done")
            timed(TRAIN_N_LONG)
            # min of two reps per length (see the extraction timing note)
            t_short = min(timed(TRAIN_N_SHORT), timed(TRAIN_N_SHORT))
            t_long = min(timed(TRAIN_N_LONG), timed(TRAIN_N_LONG))
        except Exception as e:
            print(f"# train batch {batch} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        dt = max(t_long - t_short, 1e-9) / (TRAIN_N_LONG - TRAIN_N_SHORT)
        sps = batch / dt
        row = {
            "batch": batch,
            "remat": remat,
            "ms_per_step": round(dt * 1e3, 1),
            "samples_per_sec": round(sps, 1),
            "tflops": 0.0,
            "mfu": 0.0,
        }
        if publish is not None:
            publish(row)
        print(f"# train {row}", file=sys.stderr)
        if best is None or sps > best[0]["samples_per_sec"]:
            best = (row, step, sds, dt)
    if best is None:
        return None, None
    row, step, sds, dt = best

    def cost_fn(allow_compile: bool = True):
        # achieved hardware FLOP rate: live timing (dt, measured THIS run) ×
        # the program's static flop count. The count comes from XLA's cost
        # analysis of the compiled step when the budget allows the ~60 s
        # compile (under remat this counts the recompute as executed work),
        # else from the committed cache; returns None when neither is
        # available.
        key = f"train:densenet121:{DATA_SHAPE}:b{row['batch']}:{row['remat']}"
        flops, source = 0.0, "live"
        if allow_compile:
            flops = _flops_of(step, *sds)
            _store_flops(key, flops)
            _phase(f"train batch {row['batch']} remat={row['remat']}: "
                   "cost analysis done")
        if flops <= 0:
            # deadline-skipped OR the backend exposed no cost analysis —
            # either way the committed cache still holds the static count
            flops, source = _cached_flops(key), "cached"
        if flops <= 0:
            return None
        tflops = flops / dt / 1e12
        out = dict(row)
        out["tflops"] = round(tflops, 1)
        out["mfu"] = round(tflops / V5E_PEAK_TFLOPS, 3)
        if source == "cached":
            out["flops_source"] = "cached"
        return out

    return row, cost_fn


def _build_jpeg_fixture(root: str = "/tmp/tennis_loader_bench"):
    """Synthetic 720p broadcast-like JPEG tree + its pre-resized 544 cache
    (data/frame_cache.py). Returns ``(paths, cached_paths)``; idempotent."""
    import cv2

    from tennis_tpu.data.frame_cache import resize_encode_one

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    base = rng.integers(0, 255, (45, 80, 3), np.uint8)
    frame = cv2.resize(base, (1280, 720), interpolation=cv2.INTER_CUBIC)
    for i in range(32):
        p = os.path.join(root, f"{i}.jpg")
        if not os.path.exists(p):
            noisy = cv2.add(frame, rng.integers(0, 12, frame.shape, np.uint8))
            cv2.imwrite(p, noisy, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)

    cache_root = os.path.join(root, "s544")
    os.makedirs(cache_root, exist_ok=True)
    cached_paths = []
    for p in paths:
        cp = os.path.join(cache_root, os.path.basename(p))
        if not os.path.exists(cp):
            resize_encode_one(p, cp, 544)
        cached_paths.append(cp)
    return paths, cached_paths


class _JpegDataset:
    """Decode + 512² test geometry over a fixed JPEG file list, map-style.
    ``length`` repeats the files round-robin so loaders see any dataset size."""

    def __init__(self, files, native: bool, length: int = 4096):
        self.files = files
        self.native = native
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        import cv2

        from tennis_tpu.data import transforms as T
        from tennis_tpu.data.tennis_set import _read_image_rgb

        p = self.files[i % len(self.files)]
        if self.native:
            img = _read_image_rgb(p, 544)
        else:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        return T.test_geometry(img, 512), np.int32(0), np.int32(i)


def measure_e2e(run_extract, batch: int, files, n_batches: int = 6,
                num_workers: int | None = None) -> dict:
    """Production host→device pipeline, ONE number: JPEG files → DataLoader
    (decode + 512² geometry on host threads) → ``prefetch_to_device`` →
    ``run_extract(images)`` (the already-compiled extraction program, returning
    a device scalar). The clock covers the WHOLE stream — decode, H2D transfer,
    device compute, and the final scalar fetch that is the only true barrier
    over the tunnel — so the returned frames/sec is the sustained rate of the
    reference's actual extraction workload (reference train.py:530-545: decode
    → device in one loop), not the device-only ceiling.

    ``run_extract`` must already be compiled for ``(batch, 512, 512, 3)`` uint8
    (main() reuses the headline timing program at n=1); only loader-thread
    spin-up, fixture page-cache warmth, and JPEG encoding sit outside the
    clock. The prefetch pipeline itself is created INSIDE the clock: a warm
    batch is consumed from the bare loader iterator (worker spawn + lazy
    imports) before the pipeline threads exist, so no decode/transfer of the
    counted stream can be pre-staged off-clock — an earlier version synced the
    warm batch through an already-running pipeline, letting the two queues
    stage up to ~5 batches during that unclocked sync and report up to 2.0×
    the slowest physical leg as "sustained". The honest number includes the
    one-batch-per-stage pipeline fill; n_batches ≥ 4 keeps that amortized,
    and ``fps_steady`` (+ ``overlap.fill_s``) decomposes the fill share out.
    ``run_extract=None`` measures the HOST legs only (decode+geometry,
    no device touch) — the pipeline's host-side ceiling on this box.

    Device-path rows carry an ``overlap`` breakdown attributing where the
    composition loses throughput against the slowest leg: producer-side
    decode / device_put / queue-full time (from prefetch_to_device's stats)
    plus consumer-side queue-empty waits, dispatch blocking, and the final
    drain. ``consumer_wait_s`` ≈ wall means the pipeline is producer-bound;
    a large ``producer_device_put_s`` is the GIL-holding transfer share.
    """
    from tennis_tpu.data.loader import DataLoader, prefetch_to_device

    for p in files:  # page-cache warmth is not part of the pipeline
        with open(p, "rb") as f:
            f.read()
    workers = num_workers or os.cpu_count() or 8
    # one extra leading batch is consumed BEFORE the clock: worker-pool spawn
    # and the workers' first-use lazy imports (cv2/transforms) are spin-up,
    # not steady-state pipeline throughput (same warm-up as loader_bench)
    loader = DataLoader(
        _JpegDataset(files, native=True, length=(n_batches + 1) * batch),
        batch_size=batch, num_workers=workers,
    )
    overlap = None
    if run_extract is None:
        it = iter(loader)
        next(it)
        tic = time.perf_counter()
        for _batch in it:
            pass
        dt = time.perf_counter() - tic
    else:
        ps: dict = {}
        # warm on the BARE loader iterator: worker spawn + first-use lazy
        # imports happen here, before any pipeline thread exists. Creating
        # prefetch_to_device inside the clock is the integrity invariant —
        # its queues must not stage any counted batch off-clock (see
        # docstring). run_extract and device_put are already warm (headline
        # timing / measure_h2d ran first).
        it = iter(loader)
        warm, _l, _i = next(it)
        assert np.isfinite(float(run_extract(warm)))
        tic = time.perf_counter()
        stream = prefetch_to_device(it, stats=ps)
        acc = None
        t_wait = t_dispatch = 0.0
        t_first = None  # pipeline fill: clock start → first batch delivered
        while True:
            t0 = time.perf_counter()
            try:
                images, _labels, _idxs = next(stream)
            except StopIteration:
                t_wait += time.perf_counter() - t0
                break
            t1 = time.perf_counter()
            if t_first is None:
                t_first = t1 - tic
            acc = run_extract(images)
            t_dispatch += time.perf_counter() - t1
            t_wait += t1 - t0
        t0 = time.perf_counter()
        # device stream is in-order: one fetch syncs everything
        assert np.isfinite(float(acc))
        t_drain = time.perf_counter() - t0
        dt = time.perf_counter() - tic
        overlap = {
            "wall_s": round(dt, 3),
            "fill_s": round(t_first or 0.0, 3),
            "consumer_wait_s": round(t_wait, 3),
            "consumer_dispatch_s": round(t_dispatch, 3),
            "final_drain_s": round(t_drain, 3),
            "producer_decode_s": round(ps["source_s"], 3),
            "producer_device_put_s": round(ps["device_put_s"], 3),
            "producer_queue_full_s": round(ps["queue_full_s"], 3),
        }
    row = {
        "fps": round(n_batches * batch / dt, 1),
        "frames": n_batches * batch,
        "batch": batch,
        "cores": os.cpu_count() or 1,
        "workers": workers,
    }
    if overlap is not None:
        row["overlap"] = overlap
        # steady-state rate with the one-off pipeline fill excluded: frames
        # delivered after the first batch over the wall time after it. The
        # headline ``fps`` keeps the fill (honest whole-stream number);
        # this decomposes how much of the gap to the slowest leg is fill.
        if n_batches > 1 and t_first and dt > t_first:
            row["fps_steady"] = round(
                (n_batches - 1) * batch / (dt - t_first), 1)
    return row


def measure_h2d(jax, batch: int, reps: int = 4) -> dict:
    """Host→device transfer leg alone: ``device_put`` of the e2e batch shape
    (uint8, ~100 MB at batch 128), synced by a scalar fetch per rep. Over the
    axon tunnel this is a NETWORK hop, not PCIe — on a pod host it would be
    orders of magnitude faster, which is exactly why the e2e row carries this
    leg separately."""
    import jax.numpy as jnp

    x = np.random.default_rng(1).integers(
        0, 255, (batch, DATA_SHAPE, DATA_SHAPE, 3), dtype=np.uint8)
    mb = x.nbytes / 2**20
    int(jax.device_put(x)[0, 0, 0, 0])  # warm: any one-time setup
    tic = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(x)
        int(d[0, 0, 0, 0])  # scalar fetch = the only true barrier
    dt = (time.perf_counter() - tic) / reps
    return {"mb": round(mb, 1), "mbps": round(mb / dt, 1),
            "fps_equiv": round(batch / dt, 1)}


def serve_latency_bench():
    """Online serving latency/throughput (``python bench.py --serve``): mount
    the PRODUCTION service (tennis_tpu.serve.build_service — native JPEG
    decode → request-coalescing Batcher → ONE compiled static-batch DenseNet
    program, the same warm-before-traffic path the deployment driver runs) on
    an ephemeral HTTP port and fire concurrent clients POSTing a real 720p
    JPEG. Prints one JSON line: p50/p95/p99 request latency, sustained
    requests/sec, and coalescing stats from /healthz.

    Weights are a jit-init random checkpoint — serving latency depends on the
    program geometry, not the training. NOT part of the default
    ``python bench.py`` phases (it adds a serving-batch compile to the
    budget); run standalone. No reference counterpart: the reference's only
    path to scoring new data is its offline evaluator over a TenniSet tree
    (reference evaluate.py:78-270). Over the axon tunnel the number is
    dispatch-RTT-dominated (each coalesced batch is a network round trip);
    on a pod host the same stack pays PCIe-class dispatch instead — the
    decomposition fields make that attribution readable.
    """
    import tempfile
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2
    import jax
    import jax.numpy as jnp

    from tennis_tpu import serve as serve_mod
    from tennis_tpu.data.synthetic import CLASSES
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import create_train_state, sgd_with_schedule
    from tennis_tpu.utils import checkpoint as ckpt

    jax.config.update("jax_compilation_cache_dir", _JAX_CACHE_DIR)
    batch, shape, wait_ms, clients, reqs = 8, DATA_SHAPE, 10, 16, 6
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    try:
        os.chdir(tmp)  # experiment dirs are cwd-relative
        # classes.names lookup root
        os.makedirs("data", exist_ok=True)
        with open(os.path.join("data", "classes.names"), "w") as f:
            f.write("\n".join(CLASSES) + "\n")
        model = FrameModel(get_backbone("DenseNet121", dtype=jnp.bfloat16),
                           num_classes=11, dtype=jnp.bfloat16)
        tx, _ = sgd_with_schedule(0.001)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, shape, shape, 3),
                                             jnp.float32),
                                   tx, {"train": True})
        exp = os.path.join("models", "vision", "experiments", "sl")
        os.makedirs(exp)
        ckpt.save_state(ckpt.epoch_path(exp, 0), state)
        ckpt.append_score(exp, 0, 0.5)
        del state

        serve_mod.FLAGS.unparse_flags()
        serve_mod.FLAGS(["serve.py", "--model_id=sl", "--backbone=DenseNet121",
                         f"--data_shape={shape}", f"--batch_size={batch}",
                         f"--max_wait_ms={wait_ms}"])
        _phase("serve bench: building + warming the service (compiles the "
               "serving-batch program)")
        handler, batcher = serve_mod.build_service()
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        url = "http://127.0.0.1:%d/predict" % httpd.server_address[1]

        rng = np.random.default_rng(0)
        ok, enc = cv2.imencode(
            ".jpg", rng.integers(0, 255, (720, 1280, 3)).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, 90])
        assert ok
        body = enc.tobytes()

        def post():
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        assert post()["label"]  # one warm request outside the clock
        # the warm request went through the Batcher too — snapshot its
        # counters so the reported coalescing stat covers only timed traffic
        warm_rows, warm_batches = batcher.rows, batcher.batches
        lat_ms, errors, lock = [], [], threading.Lock()

        def client():
            for _ in range(reqs):
                t0 = time.perf_counter()
                try:
                    post()
                except Exception as e:  # record, don't silently shrink n
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")
                    continue
                dt = (time.perf_counter() - t0) * 1e3
                with lock:
                    lat_ms.append(dt)

        _phase(f"serve bench: {clients} clients x {reqs} requests")
        tic = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - tic
        httpd.shutdown()

        lat = np.sort(np.asarray(lat_ms))
        n = len(lat)
        # device-compute floor for the serving batch at the last measured
        # headline extraction rate (committed record, not a literal)
        device_floor_ms = batch / _last_recorded()["extraction_fps"] * 1e3
        result = {
            "metric": f"serve p50 latency (POST /predict, DenseNet121-"
                      f"{shape} batch {batch}, {clients} clients)",
            "value": round(float(lat[n // 2]), 1) if n else 0.0,
            "unit": "ms",
            # multiple of the device-compute floor for the serving batch —
            # everything above 1.0 is decode + coalescing wait + dispatch
            # (tunnel RTT here; PCIe-class on a pod host)
            "vs_baseline": round(float(lat[n // 2]) / device_floor_ms, 1)
            if n else 0.0,
            "p95_ms": round(float(lat[int(n * 0.95)]), 1) if n else 0.0,
            "p99_ms": round(float(lat[min(int(n * 0.99), n - 1)]), 1)
            if n else 0.0,
            "requests": n,
            "failed_requests": len(errors),
            "req_per_s": round(n / wall, 1),
            "mean_rows_per_batch": round(
                (batcher.rows - warm_rows)
                / max(batcher.batches - warm_batches, 1), 2),
            "batch_size": batch,
            "max_wait_ms": wait_ms,
            "device_floor_ms": round(device_floor_ms, 2),
        }
        if errors:  # a partial/total failure must be readable in the artifact
            result["first_error"] = errors[0]
            print(f"# serve bench: {len(errors)} failed requests; first: "
                  f"{errors[0]}", file=sys.stderr)
        print(json.dumps(result))
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def loader_bench():
    """Host input-pipeline throughput probe (``python bench.py --loader``):
    synthetic 720p broadcast-like JPEGs → decode + 512² test geometry through
    the production DataLoader, native-vs-cv2 decode. Prints one JSON line.
    The reference's analogue is the gluon DataLoader worker path (reference
    train.py:187-193, dataset.py:219-227)."""
    from tennis_tpu.data.loader import DataLoader
    from tennis_tpu.native.jpeg import HAVE_NATIVE_JPEG

    paths, cached_paths = _build_jpeg_fixture()

    def run(native: bool, n_target=768, files=paths):
        workers = os.cpu_count() or 8
        dl = DataLoader(_JpegDataset(files, native), batch_size=64,
                        num_workers=workers)
        it = iter(dl)
        next(it)  # warm (spawns workers, touches page cache)
        tic, n = time.perf_counter(), 0
        for batch in it:
            n += batch[0].shape[0]
            if n >= n_target:
                break
        return n / (time.perf_counter() - tic)

    fps_cv2 = run(native=False)
    fps_native = run(native=True) if HAVE_NATIVE_JPEG else 0.0
    fps_cached = run(native=HAVE_NATIVE_JPEG, files=cached_paths)
    cores = os.cpu_count() or 1
    result = {
        "metric": "host decode+geometry (720p JPEG -> 512^2, all cores)",
        "value": round(max(fps_native, fps_cv2), 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps_native / max(fps_cv2, 1e-9), 2),
        "cores": cores,
        "fps_cv2": round(fps_cv2, 1),
        "fps_native": round(fps_native, 1),
        "fps_cached_544": round(fps_cached, 1),
        "ms_per_frame_per_core": round(cores * 1e3 / max(fps_native, fps_cv2, 1e-9), 2),
        "ms_per_frame_per_core_cached": round(cores * 1e3 / max(fps_cached, 1e-9), 2),
    }
    print(json.dumps(result))


def loader_scaling_bench():
    """Loader worker-scaling evidence (``python bench.py --loader-scaling``).

    Two measurements, one JSON line:

    1. ``workers_fps``: sustained DataLoader throughput (native decode + 512²
       geometry) at 1/2/4/8/16 worker threads. On a many-core box this is the
       workers→fps curve directly; on a 1-core box it shows whether threading
       itself costs anything (it should stay flat at the single-thread rate).
    2. ``gil_held_frac``: a sound UPPER bound on the serial fraction of the
       per-sample work — the GIL-release assumption the threaded loader rests
       on (data/loader.py:4). cProfile the decode+geometry path and classify
       self-time: cv2 C calls and the ctypes native-decode call provably
       release the GIL; EVERYTHING else (pure-Python frames, numpy builtins,
       the profiler's own overhead) counts as GIL-held. By Amdahl, worker
       scaling saturates no earlier than 1/f workers — reported as
       ``amdahl_min_workers`` per decode path. A counter-thread probe cannot
       separate GIL holding from plain core contention on a 1-core box (a
       fully-GIL-free decode still halves a spinning counter), which is why
       the bound comes from attribution, not from interference.
    """
    from tennis_tpu.data.loader import DataLoader

    paths, cached_paths = _build_jpeg_fixture()

    def sweep(files, n_target=512):
        out = {}
        for workers in (1, 2, 4, 8, 16):
            dl = DataLoader(_JpegDataset(files, native=True),
                            batch_size=64, num_workers=workers)
            it = iter(dl)
            next(it)  # warm: spawn pool, touch page cache
            tic, n = time.perf_counter(), 0
            for batch in it:
                n += batch[0].shape[0]
                if n >= n_target:
                    break
            out[str(workers)] = round(n / (time.perf_counter() - tic), 1)
        return out

    def gil_held_fraction(files, n_samples=192):
        import cProfile
        import pstats

        ds = _JpegDataset(files, native=True)
        for i in range(8):  # page cache + lazy imports outside the profile
            ds[i]
        pr = cProfile.Profile()
        pr.enable()
        for i in range(n_samples):
            ds[i]
        pr.disable()
        stats = pstats.Stats(pr)

        def releases_gil(filename: str, name: str) -> bool:
            # provable GIL releasers only; everything else (numpy builtins,
            # pure-Python frames, profiler overhead) counts as held, so the
            # returned fraction is an upper bound. decode_jpeg's self-time is
            # ≥95% inside its ctypes foreign call (ctypes drops the GIL around
            # foreign calls; the profile shows the call folded into the
            # caller's tottime) — the dozen Python statements of glue bias the
            # bound by <1%. cv2's C extensions release the GIL around codec/
            # resize work and profile as bare builtins ('<resize>'); _io
            # releases it around OS reads.
            if filename.endswith("native/jpeg.py") and name == "decode_jpeg":
                return True
            if filename == "~":
                return (name in ("<resize>", "<imdecode>", "<imread>",
                                 "<cvtColor>", "<imencode>")
                        or "cv2" in name or "_io" in name)
            return False

        released = total = 0.0
        for (filename, _line, name), (_cc, _nc, tt, _ct, _callers) \
                in stats.stats.items():
            total += tt
            if releases_gil(str(filename), str(name)):
                released += tt
        return max(0.0, min(1.0, 1.0 - released / max(total, 1e-9)))

    f_native = gil_held_fraction(paths)
    f_cached = gil_held_fraction(cached_paths)
    curve = sweep(paths)
    curve_cached = sweep(cached_paths)
    result = {
        "metric": "loader worker scaling (native decode, 720p JPEG -> 512^2)",
        "value": max(curve.values()),
        "unit": "frames/sec",
        "vs_baseline": round(max(curve.values()) / max(curve["1"], 1e-9), 2),
        "cores": os.cpu_count() or 1,
        "workers_fps": curve,
        "workers_fps_cached_544": curve_cached,
        "gil_held_frac_upper_bound": {"native": round(f_native, 3),
                                      "cached_544": round(f_cached, 3)},
        "amdahl_min_workers": {
            "native": round(1.0 / max(f_native, 1e-3), 1),
            "cached_544": round(1.0 / max(f_cached, 1e-3), 1),
        },
    }
    print(json.dumps(result))


HBM_PEAK_GBPS = 819.0


def _leg_row(name, ms, bts, opt_ms=None):
    """One attribution-table row for ``--train-legs``. Difference legs can be
    ~0 or slightly negative (timing noise on a fully-fused leg, e.g. the
    in-step optimizer update): utilization is meaningless there, so report
    null instead of a garbage quotient."""
    att = bts / HBM_PEAK_GBPS / 1e6
    util = round(att / ms, 3) if (ms > 1.0 and bts > 0) else None
    row = {"leg": name, "ms": round(ms, 1), "gb": round(bts / 1e9, 1),
           "attainable_ms": round(att, 1), "gap_ms": round(ms - att, 1),
           "hbm_util": util}
    # XLA reports optimal_seconds = -1 for ops it cannot model, and the
    # cost analysis SUMS per-op values — any large program with unmodeled
    # ops therefore yields a big negative total. Only positive estimates
    # mean anything (measured r4: fwd leg reported -1915 ms).
    if opt_ms is not None and opt_ms > 0:
        row["xla_optimal_ms"] = round(opt_ms, 1)
    return row


def train_legs_bench():
    """Train-step roofline GAP ATTRIBUTION (``python bench.py --train-legs``).

    The batch-128 block-remat DenseNet121-512 step measures ~384 ms while its
    cost-analysis bytes (273 GB) say ~333 ms is attainable at the v5e's
    ~819 GB/s HBM peak. Buckets that gap by timing each LEG of the step as its
    own loop-carried program (the tunnel-safe protocol in the module docstring)
    and comparing each leg's measured time against the attainable time from
    its OWN compiled cost analysis:

      aug  : device_augment alone
      fwd  : augment + forward(train) + loss, BN stats carried
      grad : augment + value_and_grad (grads consumed via global-norm)
      upd  : apply_gradients alone (synthetic grads, donated state)
      full : the production make_train_step

    Differences give the composed legs: backward = grad - fwd, update-in-step
    = full - grad. Each leg row carries ``hbm_util`` (attainable/measured) and
    ``xla_optimal_ms`` (XLA's own optimal_seconds estimate for the leg
    program). Streams one JSON line per leg, then the attribution line LAST
    (any prefix is a valid artifact). ~25-45 min cold: five DenseNet-sized
    compiles dominate; timing itself is seconds.
    """
    import jax
    import jax.numpy as jnp

    _devices_or_emit_fallback()
    jax.config.update("jax_compilation_cache_dir", _JAX_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from functools import partial

    import optax

    from tennis_tpu.data.transforms import device_augment
    from tennis_tpu.models import FrameModel, get_backbone
    from tennis_tpu.parallel import (
        create_train_state, make_mesh, make_train_step, sgd_with_schedule,
    )
    from tennis_tpu.parallel.mesh import tpu_compiler_options
    from tennis_tpu.parallel.sharding_rules import state_shardings
    from tennis_tpu.parallel.train_step import softmax_ce

    batch, remat = TRAIN_CANDIDATES[0]
    _phase(f"train-legs: devices {jax.devices()}")
    mesh = make_mesh(num_data=1)
    opts = tpu_compiler_options(mesh)
    tx, _ = sgd_with_schedule(0.001)
    rng = jax.random.PRNGKey(0)
    model = FrameModel(
        get_backbone("densenet121", dtype=jnp.bfloat16, remat=remat),
        num_classes=11, dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model, rng, jnp.zeros((1, DATA_SHAPE, DATA_SHAPE, 3), jnp.float32),
        tx, {"train": True}, mesh=mesh,
    )
    sh_state = state_shardings(mesh, state)
    r = np.random.default_rng(0)
    images = jax.device_put(r.integers(
        0, 255, (batch, DATA_SHAPE, DATA_SHAPE, 3), dtype=np.uint8))
    labels = jax.device_put(r.integers(0, 11, (batch,), dtype=np.int32))
    key0 = jax.random.PRNGKey(7)
    sds = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                       (state.params, state.batch_stats, images, labels, key0))

    def cost_of(fn, *s):
        """(flops, bytes, optimal_seconds) from the compiled cost analysis."""
        try:
            cost = jax.jit(fn).lower(*s).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return (float(cost.get("flops", 0.0)),
                    float(cost.get("bytes accessed", 0.0)),
                    float(cost.get("optimal_seconds", 0.0)))
        except Exception as e:
            _phase(f"cost analysis failed: {type(e).__name__}: {e}")
            return 0.0, 0.0, 0.0

    def timed_loop(runner, n_short, n_long):
        runner(n_short)  # compile
        runner(n_long)   # warm dispatch
        t_s = min(runner(n_short), runner(n_short))
        t_l = min(runner(n_long), runner(n_long))
        return max(t_l - t_s, 1e-9) / (n_long - n_short)

    legs = {}

    def record(name, dt, fn, *s):
        f, b, opt_s = cost_of(fn, *s)
        # optimal_seconds sums per-op values and XLA emits -1 for ops it
        # cannot model, so non-positive totals carry no information.
        opt_ms = opt_s * 1e3 if opt_s > 0 else None
        legs[name] = {"ms": dt * 1e3, "flops": f, "bytes": b,
                      "xla_optimal_ms": opt_ms}
        row = {"leg": name, "ms": round(dt * 1e3, 2),
               "gb": round(b / 1e9, 2),
               "attainable_ms": round(b / HBM_PEAK_GBPS / 1e6, 2),
               "xla_optimal_ms": round(opt_ms, 2) if opt_ms else None,
               "tflops": round(f / dt / 1e12, 1)}
        print(json.dumps(row), flush=True)
        _phase(f"{name} done")

    # ---- aug
    def aug_step(imgs, key):
        return jnp.sum(device_augment(imgs, key).astype(jnp.float32))

    @partial(jax.jit, compiler_options=opts)
    def aug_n(imgs, n):
        def body(i, acc):
            key = jax.random.fold_in(key0, i)
            return acc + aug_step(imgs + i.astype(jnp.uint8), key)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run_aug(n):
        tic = time.perf_counter()
        acc = float(aug_n(images, jnp.int32(n)))
        assert np.isfinite(acc)
        return time.perf_counter() - tic

    record("aug", timed_loop(run_aug, 4, 64), aug_step, sds[2], sds[4])

    # ---- fwd
    def fwd_step(params, batch_stats, imgs, labels, key):
        x = device_augment(imgs, key)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])
        return softmax_ce(out, labels), mutated["batch_stats"]

    @partial(jax.jit, compiler_options=opts)
    def fwd_n(params, batch_stats, imgs, labels, n):
        def body(i, carry):
            acc, bs = carry
            key = jax.random.fold_in(key0, i)
            loss, bs = fwd_step(params, bs, imgs + i.astype(jnp.uint8),
                                labels, key)
            return acc + loss, bs
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), batch_stats))

    def run_fwd(n):
        tic = time.perf_counter()
        acc, _bs = fwd_n(state.params, state.batch_stats, images, labels,
                         jnp.int32(n))
        assert np.isfinite(float(acc))
        return time.perf_counter() - tic

    record("fwd", timed_loop(run_fwd, 2, 10), fwd_step, *sds)

    # ---- grad
    def grad_step(params, batch_stats, imgs, labels, key):
        x = device_augment(imgs, key)

        def compute_loss(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return softmax_ce(out, labels), mutated["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        return loss + optax.global_norm(grads), bs

    @partial(jax.jit, compiler_options=opts)
    def grad_n(params, batch_stats, imgs, labels, n):
        def body(i, carry):
            acc, bs = carry
            key = jax.random.fold_in(key0, i)
            v, bs = grad_step(params, bs, imgs + i.astype(jnp.uint8),
                              labels, key)
            return acc + v, bs
        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), batch_stats))

    def run_grad(n):
        tic = time.perf_counter()
        acc, _bs = grad_n(state.params, state.batch_stats, images, labels,
                          jnp.int32(n))
        assert np.isfinite(float(acc))
        return time.perf_counter() - tic

    record("grad", timed_loop(run_grad, 2, 8), grad_step, *sds)

    # ---- upd (donated)
    grads0 = jax.jit(
        lambda p: jax.tree.map(lambda x: (x * 1e-6).astype(x.dtype), p)
    )(state.params)

    @partial(jax.jit, donate_argnums=(0,), compiler_options=opts)
    def upd_n(st, grads, n):
        def body(i, st):
            g = jax.tree.map(
                lambda x: x * (1.0 + i.astype(x.dtype) * 1e-9), grads)
            return st.apply_gradients(g)
        return jax.lax.fori_loop(0, n, body, st)

    def run_upd(n):
        nonlocal state
        tic = time.perf_counter()
        state = upd_n(state, grads0, jnp.int32(n))
        _ = float(state.step)  # barrier
        return time.perf_counter() - tic

    sds_upd = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                           (state, grads0))
    record("upd", timed_loop(run_upd, 4, 64),
           lambda st, g: st.apply_gradients(g), *sds_upd)

    # ---- full (production step, donated)
    step = make_train_step(model, mesh=mesh, preprocess=device_augment,
                           rng_seed=7, state_sharding=sh_state,
                           compiler_options=None)

    @partial(jax.jit, donate_argnums=(0,), compiler_options=opts)
    def full_n(st, imgs, labels, n):
        def body(i, carry):
            st, acc = carry
            st, loss, _logits = step(st, imgs + i.astype(jnp.uint8), labels)
            return st, acc + loss
        return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))

    def run_full(n):
        nonlocal state
        tic = time.perf_counter()
        state, acc = full_n(state, images, labels, jnp.int32(n))
        assert np.isfinite(float(acc))
        return time.perf_counter() - tic

    sds_full = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                            (state, images, labels))
    record("full", timed_loop(run_full, 2, 8), step, *sds_full)

    aug, fwd, grad, upd, full = (legs[k] for k in
                                 ("aug", "fwd", "grad", "upd", "full"))
    table = [
        _leg_row("augment", aug["ms"], aug["bytes"], aug["xla_optimal_ms"]),
        _leg_row("forward(+aug)", fwd["ms"], fwd["bytes"],
                fwd["xla_optimal_ms"]),
        _leg_row("backward (grad-fwd)", grad["ms"] - fwd["ms"],
                grad["bytes"] - fwd["bytes"]),
        _leg_row("update (full-grad)", full["ms"] - grad["ms"],
                full["bytes"] - grad["bytes"]),
        _leg_row("update (standalone)", upd["ms"], upd["bytes"],
                upd["xla_optimal_ms"]),
        _leg_row("FULL STEP", full["ms"], full["bytes"],
                full["xla_optimal_ms"]),
    ]
    print(json.dumps({
        "metric": "train-step roofline attribution (batch 128, block remat)",
        "value": round(full["ms"], 1), "unit": "ms/step",
        "vs_baseline": round(
            (full["bytes"] / HBM_PEAK_GBPS / 1e6) / max(full["ms"], 1e-9), 3),
        "attribution": table,
    }), flush=True)


def hbm_peak_bench():
    """Practical HBM streaming ceiling of this chip (``python bench.py --hbm-peak``).

    STREAM-style kernels inside a loop-carried ``fori_loop``, differenced loop
    lengths (the tunnel-safe protocol): per 128 MB bf16 buffer,

      copy : y = x + i            (read N, write N)
      triad: y = 1.5*x + y + i    (read 2N, write N, one FMA)

    Establishes the denominator for the roofline verdict: if a pure streaming
    kernel can only sustain ~X% of the 819 GB/s book number, a train step at
    X% HBM utilization is at speed-of-light. Measured on the session's v5e
    (2026-08-19, two runs): copy 657 GB/s = 80.3% of spec, triad 686 GB/s =
    83.7%. The batch-128 train step's cost-analysis bytes imply 713 GB/s
    sustained — at/above the pure-streaming ceiling — so the step's 50 ms/step
    gap vs the spec-peak roofline is spec-vs-practical bandwidth, not
    recoverable scheduling loss. (Short-loop variants of this probe returned
    546-996 GB/s run to run — tunnel dispatch jitter swamps ~20 ms of device
    time, hence the long-loop protocol below.) One JSON line, one dict per
    kernel.
    """
    import jax
    import jax.numpy as jnp

    _devices_or_emit_fallback()
    jax.config.update("jax_compilation_cache_dir", _JAX_CACHE_DIR)

    from functools import partial

    from tennis_tpu.parallel.mesh import tpu_compiler_options

    opts = tpu_compiler_options()
    n_elems = 64 * 1024 * 1024  # 64M bf16 = 128 MB per buffer
    _phase(f"hbm-peak: devices {jax.devices()}")
    x = jnp.ones((n_elems,), jnp.bfloat16)

    @partial(jax.jit, compiler_options=opts)
    def copy_n(x, n):
        def body(i, y):
            return x + i.astype(jnp.bfloat16)
        y = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x))
        return jnp.sum(y[:8].astype(jnp.float32))

    @partial(jax.jit, compiler_options=opts)
    def triad_n(x, n):
        def body(i, y):
            return jnp.bfloat16(1.5) * x + y + i.astype(jnp.bfloat16)
        y = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x))
        return jnp.sum(y[:8].astype(jnp.float32))

    def timed(fn, n):
        tic = time.perf_counter()
        s = fn(x, jnp.int32(n))
        assert np.isfinite(float(s))
        return time.perf_counter() - tic

    out = {}
    for name, fn, bytes_per_iter in (
            ("copy", copy_n, 2 * n_elems * 2),      # r1 w1, bf16
            ("triad", triad_n, 3 * n_elems * 2)):   # r2 w1
        # sub-ms kernels need LONG loops: at ~0.5 ms/iter the differenced
        # device time must dwarf the tunnel's dispatch jitter (~100s of ms),
        # or run-to-run variance exceeds 2x (observed: copy 546 vs 996 GB/s
        # at n_l=40). n is a traced arg, so loop length never recompiles.
        n_s, n_l = 128, 2048
        timed(fn, 4)    # compile
        timed(fn, n_l)  # warm dispatch
        t_s = min(timed(fn, n_s) for _ in range(3))
        t_l = min(timed(fn, n_l) for _ in range(3))
        dt = max(t_l - t_s, 1e-9) / (n_l - n_s)
        gbps = bytes_per_iter / dt / 1e9
        out[name] = {"gbps": round(gbps, 1),
                     "frac_of_819_spec": round(gbps / 819.0, 3),
                     "ms_per_iter": round(dt * 1e3, 3)}
        _phase(f"{name}: {out[name]}")
    print(json.dumps({
        "metric": "practical HBM streaming bandwidth (STREAM copy/triad)",
        "value": out["triad"]["gbps"], "unit": "GB/s",
        "vs_baseline": out["triad"]["frac_of_819_spec"],
        "kernels": out,
    }), flush=True)


def _headline_row(fps: float, batch: int) -> dict:
    """The headline artifact schema. Every superseding JSON line main() prints
    is an in-place refinement of this dict, so any prefix of the run carries
    these keys — the contract tests assert against this exact constructor."""
    return {
        "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / MXNET_BASELINE_FPS, 2),
        "batch": batch,
        "tflops": 0.0,
        "mfu": 0.0,
        "train": None,
        "e2e": None,
    }


def _emit_outage_artifact(reason: str) -> None:
    """Honest, PARSEABLE artifact instead of hanging to rc=124: value 0.0
    (nothing was measured now); the recorded numbers are from this round's
    earlier on-chip runs (README/PARITY) for context only."""
    print(json.dumps({
        "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
        "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
        "error": f"axon TPU tunnel unreachable ({reason}); nothing measured "
                 "this run",
        "last_recorded_on_chip": _last_recorded(),
    }), flush=True)


def _devices_or_emit_fallback(timeout_s: float = 150.0):
    """The benchmark's FIRST backend touch, under a watchdog thread.

    When the tunnel is down, axon registration hangs (not errors) — observed
    outages >2 h — so an unguarded ``jax.devices()`` would time the whole run
    out with no output. The watchdog adds zero overhead when the tunnel is
    healthy (it IS the registration call); on a hang or a CPU-only device
    list it prints the outage artifact and exits 0."""
    import threading

    import jax

    box = {}

    def probe():
        try:
            box["ds"] = jax.devices()
        except Exception as e:
            box["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    ds = box.get("ds")
    if ds and any("cpu" not in str(d.platform).lower() for d in ds):
        return ds
    if "ds" not in box and "err" not in box:
        reason = f"device registration hung past the {timeout_s:.0f}s watchdog"
    else:
        reason = box.get("err", f"no accelerator device in {ds}")
    _emit_outage_artifact(reason)
    os._exit(0)  # the hung registration thread cannot be joined


def main():
    import jax
    import jax.numpy as jnp

    _devices_or_emit_fallback()

    from tennis_tpu.data.transforms import device_prepare
    from tennis_tpu.models import FrameModel, get_backbone

    jax.config.update("jax_compilation_cache_dir", _JAX_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _phase(f"devices: {jax.devices()}")
    # Provisional artifact BEFORE the extraction lead-in. Two distinct hangs
    # can eat a run here and the stderr phase markers tell them apart: (a)
    # host tracing + MLIR lowering of the DenseNet fori_loop, not covered by
    # the persistent cache — observed 844 s on a 1-core session box (vs 24 s
    # round 3), burns CPU; (b) a wedged tunnel — the device RPC never returns,
    # ~0% CPU, even with a compile-cache hit (observed: 33 min at 0.6% CPU
    # after a 10 s lead-in while a parallel `jax.devices()` probe also hung).
    # If the driver's hard budget cuts the run inside either window, this line
    # keeps the artifact parseable and honest (superseded the moment the real
    # headline flushes).
    print(json.dumps({
        "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
        "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
        "error": "run cut during the lead-in (host tracing/lowering, or a "
                 "device dispatch that never returned — a wedged tunnel); "
                 "nothing measured yet this run. stderr phase markers "
                 "attribute which: per-batch markers print before each "
                 "dispatch, and a marker that never gets a successor at "
                 "near-zero CPU means the tunnel hung",
        "last_recorded_on_chip": _last_recorded(),
    }), flush=True)
    model = FrameModel(get_backbone("densenet121", dtype=jnp.bfloat16),
                       dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    # init MUST be jitted: eager init round-trips per op over the TPU tunnel
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, DATA_SHAPE, DATA_SHAPE, 3), jnp.bfloat16)
    )
    _phase("model init done")

    # Per-phase wall-times, carried in the artifact (result["phase_times"])
    # so a degraded run documents WHERE the budget went — the round-4 artifact
    # lost its refine to the deadline with no in-band record of why.
    phase_times: dict = {}
    _t_mark = [time.perf_counter()]

    def _mark(name: str, optional: bool = False) -> None:
        now = time.perf_counter()
        phase_times[name] = round(now - _t_mark[0], 1)
        if optional:  # charge the phase to the optional budget (_have_time)
            _OPTIONAL_SPENT[0] += now - _t_mark[0]
        _t_mark[0] = now

    phase_times["lead_in"] = round(time.perf_counter() - _T0, 1)

    from functools import partial

    from tennis_tpu.parallel.mesh import tpu_compiler_options

    opts = tpu_compiler_options()

    # n is a TRACED scalar: ONE compile covers every loop length (the tuned
    # compiler options roughly double compile time, so the cold-cache path
    # matters — see the output contract in the module docstring)
    @partial(jax.jit, compiler_options=opts)
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
        # fetch = true barrier
        acc = float(extract_n(variables, images, jnp.int32(n)))
        dt = time.perf_counter() - tic
        assert np.isfinite(acc)
        return dt

    @partial(jax.jit, compiler_options=opts)
    def extract_one(variables, images_u8):
        return model.apply(variables, device_prepare(images_u8), train=False)

    # Wedge watchdog: if the first dispatch has not returned after this long,
    # upgrade the provisional artifact with a conclusive attribution line (the
    # main thread is blocked inside the RPC and cannot do it itself). Observed
    # 2026-08-20: a wedged tunnel held the first extract_n dispatch >33 min at
    # ~0% CPU while the TCP endpoint stayed reachable and SMALL programs kept
    # executing from other processes — so the watchdog also reports the
    # bounded TCP probe, which distinguishes "tunnel down" from "large-program
    # dispatch wedged". A run that later recovers supersedes this line with
    # the real headline (consumers take the LAST JSON line).
    import threading
    _first_dispatch_done = threading.Event()

    def _wedge_watchdog(limit_s: float = 600.0) -> None:
        if _first_dispatch_done.wait(limit_s):
            return
        try:
            from tennis_tpu.utils.tunnel import tpu_reachable
            tcp = "reachable" if tpu_reachable() else "UNREACHABLE"
        except Exception:
            tcp = "unknown"
        print(f"# WATCHDOG: first dispatch still blocked after {limit_s:.0f}s "
              f"at near-zero CPU; tunnel TCP endpoint {tcp}",
              file=sys.stderr, flush=True)
        print(json.dumps({
            "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
            "value": 0.0, "unit": "frames/sec", "vs_baseline": 0.0,
            "error": f"device dispatch wedged: first extract_n dispatch did "
                     f"not return within {limit_s:.0f}s (host lead-in had "
                     f"completed; tunnel TCP endpoint {tcp}). This is a "
                     f"device/tunnel failure, not a measurement of the "
                     f"workload",
            "last_recorded_on_chip": _last_recorded(),
        }), flush=True)

    threading.Thread(target=_wedge_watchdog, daemon=True).start()

    best_fps, best_batch, best_images = 0.0, 0, None
    for batch in BATCH_CANDIDATES:
        images = jax.device_put(
            np.random.default_rng(0).integers(
                0, 255, (batch, DATA_SHAPE, DATA_SHAPE, 3), dtype=np.uint8
            )
        )
        try:
            # marker BEFORE the dispatch: if the run is later found cut with
            # this as the last stderr line, the hang is attributable (high
            # CPU → host lowering; ~0% CPU → tunnel/device never returned)
            _phase(f"batch {batch}: tracing/lowering, then first dispatch")
            timed(batch, N_SHORT, images)  # the single compile
            _first_dispatch_done.set()
            timed(batch, N_LONG, images)   # warm dispatch
            # two reps, min per loop length: dispatch jitter is additive, so
            # the min is the clean estimate — a single noisy t_short shrinks
            # the difference and can inflate fps by >50% (observed once in a
            # flag ablation: a phantom 3998 fps that two reps dispelled)
            t_short = min(timed(batch, N_SHORT, images),
                          timed(batch, N_SHORT, images))
            t_long = min(timed(batch, N_LONG, images),
                         timed(batch, N_LONG, images))
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
            best_fps, best_batch, best_images = fps, batch, images

    result = _headline_row(best_fps, best_batch)
    result["phase_times"] = phase_times  # same dict object: updated in place
    # the e2e pipeline below drives the DYNAMIC extract_n program, so its leg
    # attribution must use this rate — the static-unroll refine may lift the
    # headline ~3.5% above what the pipeline can actually reach
    dynamic_fps = best_fps
    _mark("extract_timing")
    # Flush the headline line NOW — before any further compile — so a timeout
    # leaves a parseable artifact (the driver takes the last JSON line). The
    # extraction cost analysis (another ~40 s compile) is DEFERRED until after
    # the train row lands: the train samples/sec number matters more than the
    # extraction mfu decoration, so it gets the earlier slot in the budget.
    print(json.dumps(result), flush=True)
    _phase("extraction result flushed; static-unroll refine")

    # Static-unroll refine IMMEDIATELY after the first timing (round-4 lesson:
    # parked last, it was the first casualty of a slow box and the headline
    # regressed 2362.3 → 2343.5). A STATIC trip count lets XLA pipeline across
    # iterations (measured ~3.5% faster: 2389 vs 2308 fps) for one compile per
    # loop length; the cost analyses are now the deadline casualties instead.
    @partial(jax.jit, static_argnames=("n",), compiler_options=opts)
    def extract_static(variables, images_u8, n):
        def body(i, acc):
            imgs = images_u8 + i.astype(jnp.uint8)
            feats = model.apply(variables, device_prepare(imgs), train=False)
            return acc + jnp.sum(feats.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    try:
        if best_images is not None and _have_time("static-unroll refine",
                                                  expected_s=60.0):
            def timed_s(n):
                tic = time.perf_counter()
                acc = float(extract_static(variables, best_images, n))
                assert np.isfinite(acc)
                return time.perf_counter() - tic

            timed_s(N_SHORT)
            timed_s(N_LONG)
            t_short = min(timed_s(N_SHORT), timed_s(N_SHORT))
            t_long = min(timed_s(N_LONG), timed_s(N_LONG))
            fps_s = best_batch * (N_LONG - N_SHORT) / max(t_long - t_short,
                                                          1e-9)
            print(f"# static-unroll extraction: {fps_s:.1f} frames/sec",
                  file=sys.stderr, flush=True)
            if fps_s > result["value"]:
                best_fps = fps_s  # the later mfu/tflops math uses the refined
                result.update(value=round(fps_s, 1),
                              vs_baseline=round(fps_s / MXNET_BASELINE_FPS, 2))
                print(json.dumps(result), flush=True)
    except Exception as e:
        print(f"# static refine failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    _mark("static_refine", optional=True)
    _phase("refine done; e2e pipeline")

    # End-to-end pipeline NEXT (before the ~230 s train compile): it reuses
    # the extract_n program just compiled (n=1 — no new compile, ~35 s total),
    # so running it here guarantees the number lands even on runs the soft
    # deadline later cuts. This is the number that closes the seam between the
    # device-only ceiling above and the host-only `--loader` probe: sustained
    # decode→device fps through the production DataLoader on this box, plus
    # the cached-544 steady-state variant (PARITY D16). Matches the
    # reference's actual extraction workload (train.py:530-545: decode →
    # device in one loop).
    # ESSENTIAL like the train row (a round "done" criterion), so NOT gated on
    # the soft deadline: it reuses the already-compiled program, flushes its
    # superseding line immediately, and a later hard cut costs only the phases
    # after it. On a slow-host box the lead-in alone can eat the whole soft
    # deadline, and gating here was observed to silently drop the pipeline row.
    if best_images is not None:
        try:
            paths, cached_paths = _build_jpeg_fixture()
            run = lambda imgs: extract_n(variables, imgs, jnp.int32(1))
            # cheap per-leg probes FIRST — they both size the full run and
            # attribute which stage bounds the pipeline here
            host_fps = measure_e2e(None, best_batch, paths,
                                   n_batches=3)["fps"]
            h2d = measure_h2d(jax, best_batch, reps=2)
            # scale the full uncached run to the rate this box can actually
            # sustain: composition can land well below the slowest leg (the
            # thing the overlap row attributes), so predict at half the
            # min-leg and target ~20 s of streaming. Round-4 lesson: a fixed
            # 6-batch run at 13.7 fps ate 56 s of the budget. Floor of 4:
            # the honest clock includes the one-batch-per-stage pipeline
            # fill, which a 2-batch run would dominate.
            pred_fps = min(host_fps, h2d["fps_equiv"]) / 2.0
            n_b = int(np.clip(round(pred_fps * 20.0 / best_batch), 4, 6))
            e2e = measure_e2e(run, best_batch, paths, n_batches=n_b)
            # the cached variant matters on decode-bound hosts; when the
            # tunnel's H2D leg binds (see bound_by) it just re-measures the
            # transfer, so keep it short
            e2e["fps_cached_544"] = measure_e2e(run, best_batch, cached_paths,
                                                n_batches=3)["fps"]
            e2e["host_fps"] = host_fps
            e2e["h2d_mbps"] = h2d["mbps"]
            e2e["h2d_fps_equiv"] = h2d["fps_equiv"]
            # attribute against the dynamic extract_n rate (the program the
            # pipeline runs), NOT result["value"] which the static-unroll
            # refine may have lifted above it
            e2e["device_fps"] = round(dynamic_fps, 1)
            legs = {"host_decode": e2e["host_fps"],
                    "h2d_transfer": e2e["h2d_fps_equiv"],
                    "device_compute": e2e["device_fps"]}
            e2e["bound_by"] = min(legs, key=legs.get)
            e2e["ratio_of_device"] = round(e2e["fps"] / max(dynamic_fps,
                                                            1e-9), 3)
            e2e["ratio_of_min_leg"] = round(
                e2e["fps"] / max(min(legs.values()), 1e-9), 3)
            result["e2e"] = e2e
            print(json.dumps(result), flush=True)
            print(f"# e2e {e2e}", file=sys.stderr, flush=True)
        except Exception as e:
            print(f"# e2e pipeline failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    _mark("e2e")
    _phase("e2e done; starting train phase")

    def publish_train(row):
        result["train"] = row
        print(json.dumps(result), flush=True)

    best_train_row, train_cost_fn = measure_train(jax, jnp,
                                                  publish=publish_train)
    if best_train_row is not None and result["train"] != best_train_row:
        # publish() emitted each candidate as its timing landed; make sure the
        # artifact carries the BEST row, not merely the last-tried one
        result["train"] = best_train_row
        print(json.dumps(result), flush=True)
    _mark("train_timing")
    _phase("train timing done; extraction cost analysis")

    if best_images is not None:
        key = f"extract:densenet121:{DATA_SHAPE}:b{best_batch}"
        best_flops = 0.0
        if _have_time("extraction cost analysis", expected_s=45.0):
            best_flops = _flops_of(extract_one, variables, best_images)
            _store_flops(key, best_flops)
        if best_flops <= 0:
            # deadline skipped the live compile, or the backend exposed no
            # cost analysis: FLOPs are static, so the committed cache keeps
            # mfu/tflops from regressing to 0.0 — flops_source marks the row
            best_flops = _cached_flops(key)
            if best_flops > 0:
                result["flops_source"] = "cached"
        if best_flops > 0:
            infer_tflops = best_fps * (best_flops / max(best_batch, 1)) / 1e12
            result["tflops"] = round(infer_tflops, 1)
            result["mfu"] = round(infer_tflops / V5E_PEAK_TFLOPS, 3)
            print(json.dumps(result), flush=True)
    _mark("extract_cost_analysis", optional=True)
    _phase("extraction cost analysis done; train cost analysis")

    if train_cost_fn is not None:
        refined = train_cost_fn(
            allow_compile=_have_time("train cost analysis", expected_s=75.0))
        if refined is not None:
            result["train"] = refined
    _mark("train_cost_analysis", optional=True)
    print(json.dumps(result), flush=True)  # final line: full phase_times map
    _store_last_recorded(result)
    _phase("done")


if __name__ == "__main__":
    if "--train-legs" in sys.argv[1:]:
        train_legs_bench()
    elif "--hbm-peak" in sys.argv[1:]:
        hbm_peak_bench()
    elif "--loader-scaling" in sys.argv[1:]:
        loader_scaling_bench()
    elif "--loader" in sys.argv[1:]:
        loader_bench()
    elif "--serve" in sys.argv[1:]:
        serve_latency_bench()
    else:
        main()
