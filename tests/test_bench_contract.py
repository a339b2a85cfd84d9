"""Unit coverage for bench.py's output-contract helpers.

The driver parses the LAST JSON line of `python bench.py` under a hard
wall-clock budget, so the helpers that guarantee "any prefix of the run is a
valid artifact" — the soft-deadline gate and the tunnel-outage artifact — are
contract surface, not plumbing. Real-TPU timing itself is exercised on
hardware by the driver; these tests pin the host-side logic.
"""
import importlib
import json
import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parents[1])


def _fresh_bench(monkeypatch, deadline: str):
    monkeypatch.setenv("BENCH_SOFT_DEADLINE_S", deadline)
    # `bench` lives at the repo root, which is only on sys.path when pytest is
    # launched from there — pin it so `pytest tests/...` works from any cwd
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    sys.modules.pop("bench", None)
    return importlib.import_module("bench")


def test_have_time_gates_on_soft_deadline(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, "0")
    # elapsed since import is >= 0, so a 0-second backstop is already past
    assert bench._have_time("anything-optional") is False
    assert "skipping" in capsys.readouterr().err

    bench = _fresh_bench(monkeypatch, "100000")
    assert bench._have_time("anything-optional") is True
    assert capsys.readouterr().err == ""


def test_have_time_accounts_for_expected_phase_cost(monkeypatch, capsys):
    """A phase whose own expected duration would cross the gate is skipped
    even though the gate has not YET passed (prevents rc=124 mid-compile)."""
    bench = _fresh_bench(monkeypatch, "100000")
    assert bench._have_time("cheap", expected_s=1.0) is True
    assert bench._have_time("a-60s-compile", expected_s=1e9) is False
    assert "a-60s-compile" in capsys.readouterr().err


def test_optional_budget_is_independent_of_mandatory_slowness(monkeypatch,
                                                              capsys):
    """Round-5 regression: a cold-cache box's 648 s MANDATORY compile must not
    starve the ~80 s optional refine. Only time charged as optional counts
    against the optional budget; a huge mandatory lead-in alone never skips."""
    import time as _time
    bench = _fresh_bench(monkeypatch, "1200")
    # simulate a 600 s mandatory lead-in: under the OLD 470 s wall-clock gate
    # this skipped every optional phase; now it must not
    bench._T0 = _time.perf_counter() - 600.0
    assert bench._have_time("static-unroll refine", expected_s=80.0) is True
    assert capsys.readouterr().err == ""
    # but optional spend DOES count: 250 s already charged + an 80 s phase
    # crosses the 300 s default budget
    bench._OPTIONAL_SPENT[0] = 250.0
    assert bench._have_time("train cost analysis", expected_s=80.0) is False
    assert "optional budget" in capsys.readouterr().err
    # and the absolute backstop still protects a pathologically slow box
    bench._OPTIONAL_SPENT[0] = 0.0
    bench._T0 = _time.perf_counter() - 1150.0
    assert bench._have_time("static-unroll refine", expected_s=80.0) is False
    assert "soft deadline" in capsys.readouterr().err


def test_outage_artifact_is_parseable_last_line(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, "470")
    bench._emit_outage_artifact("tunnel test reason")
    out = capsys.readouterr().out.strip().splitlines()
    row = json.loads(out[-1])  # the driver takes the LAST JSON line
    # the driver's schema: metric/value/unit/vs_baseline must always be present
    assert row["metric"].startswith("frames/sec/chip")
    assert row["value"] == 0.0 and row["vs_baseline"] == 0.0
    assert row["unit"] == "frames/sec"
    assert "tunnel test reason" in row["error"]
    # context numbers ride along but are clearly marked as prior measurements
    assert row["last_recorded_on_chip"]["extraction_fps"] > 0


def test_result_schema_prefixes_are_supersets(monkeypatch):
    """Every superseding line keeps the headline keys: a consumer of ANY
    prefix of the run sees the same schema, only with richer values. Asserted
    against the REAL constructor main() uses (bench._headline_row), so schema
    drift in the code fails here."""
    bench = _fresh_bench(monkeypatch, "470")
    headline = bench._headline_row(1234.5, 128)
    assert headline["metric"].startswith("frames/sec/chip")
    assert headline["value"] == 1234.5
    assert headline["unit"] == "frames/sec"
    assert headline["vs_baseline"] == round(1234.5 / bench.MXNET_BASELINE_FPS, 2)
    assert headline["train"] is None
    assert headline["e2e"] is None
    # the in-place mutations main() performs between prints
    refined = dict(headline, tflops=70.0, mfu=0.355)
    with_train = dict(refined, train={
        "batch": 128, "remat": "block", "ms_per_step": 383.0,
        "samples_per_sec": 334.5, "tflops": 0.0, "mfu": 0.0,
    })
    for later in (refined, with_train):
        assert set(headline) <= set(later)
    assert bench.SOFT_DEADLINE_S == 470.0  # pinned by _fresh_bench's env
    # the outage artifact shares the four driver-required keys
    outage_keys = {"metric", "value", "unit", "vs_baseline"}
    assert outage_keys <= set(headline)


def test_leg_row_reports_null_util_on_degenerate_difference_legs(monkeypatch):
    """--train-legs difference legs (full - grad) can be ~0 or negative; the
    attribution row must carry hbm_util=None there instead of the garbage
    quotient an unguarded att/ms would produce (observed: -9222251.5)."""
    bench = _fresh_bench(monkeypatch, "470")
    # a real leg: 273 GB in 383 ms -> util ~0.87 of the 819 GB/s spec peak
    row = bench._leg_row("FULL STEP", 383.0, 273e9, opt_ms=300.0)
    assert row["hbm_util"] == round((273e9 / 819.0 / 1e6) / 383.0, 3)
    assert row["gap_ms"] == round(383.0 - 273e9 / 819.0 / 1e6, 1)
    assert row["xla_optimal_ms"] == 300.0
    # degenerate: near-zero/negative ms or bytes -> util is null, row still
    # carries the raw numbers for the reader
    assert bench._leg_row("update (full-grad)", -1.4, -2e7)["hbm_util"] is None
    assert bench._leg_row("tiny", 0.07, 3.1e8)["hbm_util"] is None
    assert "xla_optimal_ms" not in bench._leg_row("tiny", 0.07, 3.1e8)
    # XLA sums per-op optimal_seconds and emits -1 for unmodeled ops, so a
    # big program can report a large NEGATIVE total (observed r4: -1915 ms
    # on the fwd leg). Non-positive estimates must be dropped, not printed.
    assert "xla_optimal_ms" not in bench._leg_row(
        "forward(+aug)", 88.5, 62.5e9, opt_ms=-1915.1)
    assert "xla_optimal_ms" not in bench._leg_row(
        "forward(+aug)", 88.5, 62.5e9, opt_ms=0.0)


def test_flops_cache_roundtrip_and_degenerate_values(monkeypatch, tmp_path):
    """The committed static-FLOPs cache keeps tflops/mfu from regressing to
    0.0 when the soft deadline skips a live cost-analysis compile. Store/load
    must round-trip, ignore non-positive counts, and fail soft on a missing
    or corrupt file."""
    bench = _fresh_bench(monkeypatch, "470")
    cache = tmp_path / "flops.json"
    monkeypatch.setattr(bench, "_FLOPS_CACHE_PATH", str(cache))

    # missing file -> 0.0, no exception
    assert bench._cached_flops("extract:densenet121:512:b128") == 0.0

    bench._store_flops("extract:densenet121:512:b128", 3.79e12)
    bench._store_flops("train:densenet121:512:b128:block", 1.45e13)
    assert bench._cached_flops("extract:densenet121:512:b128") == 3.79e12
    assert bench._cached_flops("train:densenet121:512:b128:block") == 1.45e13
    # second store updates in place without clobbering other keys
    bench._store_flops("extract:densenet121:512:b128", 3.80e12)
    assert bench._cached_flops("extract:densenet121:512:b128") == 3.80e12
    assert bench._cached_flops("train:densenet121:512:b128:block") == 1.45e13

    # non-positive counts (cost analysis unavailable) must not poison the file
    bench._store_flops("extract:densenet121:512:b128", 0.0)
    bench._store_flops("extract:densenet121:512:b128", -1.0)
    assert bench._cached_flops("extract:densenet121:512:b128") == 3.80e12

    # corrupt file -> 0.0, no exception
    cache.write_text("{not json")
    assert bench._cached_flops("extract:densenet121:512:b128") == 0.0


def test_last_recorded_roundtrip_and_fallback(monkeypatch, tmp_path):
    """Outage/provisional artifacts quote the LAST successful on-chip numbers
    from a record file successful runs refresh; with no (or corrupt) record
    they fall back to the round-3 literals, and zero runs never overwrite a
    real record."""
    bench = _fresh_bench(monkeypatch, "470")
    record = tmp_path / "last.json"
    monkeypatch.setattr(bench, "_LAST_RUN_PATH", str(record))

    # no record yet -> the committed fallback numbers
    fb = bench._last_recorded()
    assert fb["extraction_fps"] > 0 and fb["mfu"] > 0

    # a successful run refreshes the record
    bench._store_last_recorded({
        "value": 2400.0, "mfu": 0.36,
        "train": {"samples_per_sec": 340.0},
    })
    row = bench._last_recorded()
    assert row == {"extraction_fps": 2400.0, "mfu": 0.36,
                   "train_samples_per_sec": 340.0}

    # a zero/failed run must NOT clobber it
    bench._store_last_recorded({"value": 0.0, "mfu": 0.0, "train": None})
    assert bench._last_recorded()["extraction_fps"] == 2400.0
    # fields MERGE: a run whose train phase failed (or whose mfu was
    # skipped without a cache hit) keeps the last-known-good values
    bench._store_last_recorded({"value": 2500.0, "mfu": 0.0, "train": None})
    assert bench._last_recorded() == {"extraction_fps": 2500.0, "mfu": 0.36,
                                      "train_samples_per_sec": 340.0}
    # a stored non-positive field is never quoted back
    record.write_text(json.dumps({"extraction_fps": 2500.0, "mfu": 0.0}))
    assert "mfu" not in bench._last_recorded()

    # corrupt record -> fallback, no exception
    record.write_text("{nope")
    assert bench._last_recorded()["extraction_fps"] == fb["extraction_fps"]

    # the outage artifact quotes the record
    record.unlink()
    bench._store_last_recorded({"value": 2401.5, "mfu": 0.361,
                                "train": {"samples_per_sec": 333.0}})
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit_outage_artifact("test")
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["last_recorded_on_chip"]["extraction_fps"] == 2401.5


def test_repo_flops_cache_is_seeded():
    """bench.py ships with the cache pre-seeded for the two headline programs,
    so even a first slow-host run reports nonzero mfu. Values must be in the
    physically plausible range (DenseNet121 at 512^2 is ~30 GFLOP/frame)."""
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    ex = bench._cached_flops("extract:densenet121:512:b128")
    tr = bench._cached_flops("train:densenet121:512:b128:block")
    assert 1e12 < ex < 1e13, ex  # ~3.8e12 (29.7 GFLOP/frame * 128)
    assert 5e12 < tr < 5e13, tr  # ~1.45e13 (fwd + remat recompute + bwd)
    # train step must cost more than the inference forward
    assert tr > ex


def test_measure_e2e_drives_the_production_loader(monkeypatch, tmp_path):
    """measure_e2e streams real JPEG decode through DataLoader →
    prefetch_to_device → the extract callable, and its row carries the keys
    main() publishes. A fake extract (device sum) stands in for the compiled
    program; shapes/dtypes are asserted to match what extract_n would see."""
    bench = _fresh_bench(monkeypatch, "470")
    paths, cached = bench._build_jpeg_fixture(str(tmp_path))
    assert len(paths) == len(cached) == 32
    seen = []

    def fake_extract(images):
        assert images.shape == (8, 512, 512, 3) and images.dtype == "uint8"
        seen.append(images.shape[0])
        return images.astype("float32").sum()

    row = bench.measure_e2e(fake_extract, batch=8, files=paths,
                            n_batches=3, num_workers=2)
    # one extra leading batch runs OUTSIDE the clock (worker spin-up + lazy
    # imports are not steady-state throughput); frames counts only timed ones
    assert seen == [8, 8, 8, 8]
    assert row["frames"] == 24 and row["batch"] == 8 and row["workers"] == 2
    assert row["fps"] > 0
    # the overlap attribution breakdown rides on device-path rows
    ov = row["overlap"]
    assert set(ov) == {"wall_s", "fill_s", "consumer_wait_s",
                       "consumer_dispatch_s", "final_drain_s",
                       "producer_decode_s", "producer_device_put_s",
                       "producer_queue_full_s"}
    assert ov["wall_s"] > 0 and all(v >= 0 for v in ov.values())
    # steady-state decomposition: whole-stream fps keeps the pipeline fill,
    # fps_steady excludes it (frames after the first delivered batch)
    assert row["fps_steady"] > 0 and ov["fill_s"] > 0
    # measurement-integrity invariant: the prefetch pipeline is created
    # INSIDE the clock, so the counted batches' decode (producer source
    # time) is on-clock — a pre-staging regression would zero this out
    # while wall_s stays positive
    assert ov["producer_decode_s"] > 0

    # host-only mode (run_extract=None): decode legs without any device touch
    host_row = bench.measure_e2e(None, batch=8, files=cached,
                                 n_batches=2, num_workers=2)
    assert host_row["fps"] > 0 and host_row["frames"] == 16
    assert "overlap" not in host_row  # nothing to attribute host-only
