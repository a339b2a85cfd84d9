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


def _fresh_bench(monkeypatch, deadline: str):
    monkeypatch.setenv("BENCH_SOFT_DEADLINE_S", deadline)
    sys.modules.pop("bench", None)
    return importlib.import_module("bench")


def test_have_time_gates_on_soft_deadline(monkeypatch, capsys):
    bench = _fresh_bench(monkeypatch, "0")
    # elapsed since import is >= 0, so a 0-second deadline is already past
    assert bench._have_time("anything-optional") is False
    assert "skipping anything-optional" in capsys.readouterr().err

    bench = _fresh_bench(monkeypatch, "100000")
    assert bench._have_time("anything-optional") is True
    assert capsys.readouterr().err == ""


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
    prefix of the run sees the same schema, only with richer values."""
    bench = _fresh_bench(monkeypatch, "470")
    headline = {
        "metric": "frames/sec/chip (DenseNet121-512 feature extraction)",
        "value": 1.0, "unit": "frames/sec", "vs_baseline": 0.01,
        "batch": 128, "tflops": 0.0, "mfu": 0.0, "train": None,
    }
    # the in-place mutations main() performs between prints
    refined = dict(headline, tflops=70.0, mfu=0.355)
    with_train = dict(refined, train={
        "batch": 128, "remat": "block", "ms_per_step": 383.0,
        "samples_per_sec": 334.5, "tflops": 0.0, "mfu": 0.0,
    })
    for later in (refined, with_train):
        assert set(headline) <= set(later)
    assert bench.SOFT_DEADLINE_S == 470.0
