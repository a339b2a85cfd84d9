"""Unit coverage for the executable parity harness (tennis_tpu.parity).

The end-to-end dry-run (fixture build → 6 stand-in trainings → 6 evaluations
→ gate table) is exercised by ``python -m tennis_tpu.parity --dry-run`` and is
too heavy for the unit suite; these tests pin the tolerance arithmetic — the
codified PARITY.md D1-D16 table — and the documented row-command surface.
"""
import json

import pytest

from tennis_tpu import parity


def _vision_exact(row):
    """A measured dict that reproduces the published row exactly."""
    meas = {f"{c}_f1": v / 100.0
            for c, v in zip(parity.CLASSES, parity.PUBLISHED_F1[row])}
    meas["AVG_NB_f1"] = sum(parity.PUBLISHED_F1[row][1:]) / 10.0 / 100.0
    return meas


def test_vision_gates_pass_at_published_values():
    for row in parity.PUBLISHED_F1:
        checks = parity.gate_vision(row, _vision_exact(row))
        assert all(c["pass"] for c in checks if c["gated"]), (row, checks)
        # SNL is reported but never gated (PARITY.md D5: 9/1/2 events)
        snl = next(c for c in checks if c["metric"] == "SNL_f1")
        assert snl["gated"] is False and snl["pass"] is None


def test_vision_gate_tolerances():
    # ±3.0 per-class (D3): 3.1 over fails, 2.9 passes
    meas = _vision_exact("0006")
    meas["SFI_f1"] = (57.9 + 3.1) / 100.0
    checks = {c["metric"]: c for c in parity.gate_vision("0006", meas)}
    assert checks["SFI_f1"]["pass"] is False
    meas["SFI_f1"] = (57.9 - 2.9) / 100.0
    checks = {c["metric"]: c for c in parity.gate_vision("0006", meas)}
    assert checks["SFI_f1"]["pass"] is True

    # tiny classes SFF/SFL gate at ±5.0 (D5)
    meas = _vision_exact("0006")
    meas["SFF_f1"] = (17.7 + 4.9) / 100.0
    checks = {c["metric"]: c for c in parity.gate_vision("0006", meas)}
    assert checks["SFF_f1"]["pass"] is True and checks["SFF_f1"]["tol"] == 5.0

    # AVG_NB at ±2.0 (D3)
    meas = _vision_exact("0006")
    meas["AVG_NB_f1"] += 0.021  # fractions: +2.1 points
    checks = {c["metric"]: c for c in parity.gate_vision("0006", meas)}
    assert checks["AVG_NB_f1"]["pass"] is False


def test_captioning_gates():
    # the gate's input is the RAW nlg_metric_suite dict (fractions /
    # pycocoevalcap CIDEr scale); published values are that x 100
    exact = {k: v / 100.0 for k, v in parity.PUBLISHED_0102.items()}
    checks = parity.gate_captioning(exact)
    assert all(c["pass"] for c in checks if c["gated"])
    by = {c["metric"]: c for c in checks}
    # BLEU-1..3 at ±1.0 (D2), BLEU-4 at ±1.5 (D13)
    assert by["Bleu_1"]["tol"] == 1.0 and by["Bleu_4"]["tol"] == 1.5
    wide = dict(exact, Bleu_4=exact["Bleu_4"] - 0.014)  # -1.4 points
    assert {c["metric"]: c for c in parity.gate_captioning(wide)}["Bleu_4"]["pass"]
    over = dict(exact, Bleu_1=exact["Bleu_1"] + 0.011)  # +1.1 points
    assert not {c["metric"]: c
                for c in parity.gate_captioning(over)}["Bleu_1"]["pass"]
    # METEOR is a one-sided floor (D1: no WordNet stage, reads low only)
    low = dict(exact, METEOR=0.194)
    assert not {c["metric"]: c
                for c in parity.gate_captioning(low)}["METEOR"]["pass"]
    high = dict(exact, METEOR=0.250)
    assert {c["metric"]: c for c in parity.gate_captioning(high)}["METEOR"]["pass"]
    # ROUGE-L / CIDEr are report-only (no documented tolerance)
    assert by["ROUGE_L"]["gated"] is False and by["CIDEr"]["gated"] is False


def test_captioning_gate_scale_regression():
    """Round-4 bug: a real-data run at PERFECT parity (suite Bleu_1 = 0.467
    for published 46.7) failed every gated caption metric because the gate
    compared fractions against percents. Pin the fraction→percent conversion
    directly against the real published table."""
    perfect = {k: v / 100.0 for k, v in parity.PUBLISHED_0102.items()}
    checks = parity.gate_captioning(perfect)
    assert all(c["pass"] for c in checks if c["gated"]), checks
    # measured values are reported on the published (percent) scale
    by = {c["metric"]: c for c in checks}
    assert by["Bleu_1"]["measured"] == pytest.approx(46.7)
    assert by["CIDEr"]["measured"] == pytest.approx(96.4)


def test_captioning_seam_producer_to_gate(tmp_path):
    """Round-trip an ACTUAL nlg_metric_suite output through the
    evaluate_gnmt --metrics_out writer path (json.dump of the raw suite) into
    gate_captioning, asserting a known-parity corpus passes its gates. This is
    the seam the round-4 scale bug lived on: hand-built percent dicts never
    exercised the producer's scale."""
    from tennis_tpu.metrics.nlg import nlg_metric_suite

    refs = [["player serves an ace to the far side".split()],
            ["a quick forehand winner down the line".split()],
            ["player serves into the net".split()],
            ["a long rally ends with a backhand error".split()]]
    # imperfect but overlapping hypotheses — every metric lands strictly
    # inside (0, 1) so a missing/extra x100 cannot hide
    hyps = ["player serves an ace to the near side".split(),
            "a quick backhand winner down the line".split(),
            "player serves into the net".split(),
            "a long rally ends with an error".split()]
    suite = nlg_metric_suite(refs, hyps)
    assert all(0.0 < v < 1.0 for k, v in suite.items() if k != "CIDEr"), suite

    # the exact --metrics_out producer path (evaluate_gnmt.py writer)
    out = tmp_path / "metrics_0102.json"
    with open(out, "w") as f:
        json.dump(suite, f)
    with open(out) as f:
        measured = json.load(f)

    # known-parity: gate against this corpus's own published-scale row
    published = {k: round(v * 100.0, 1) for k, v in suite.items()}
    published["METEOR"] = 19.5  # the real gate's floor semantics need a floor
    checks = parity.gate_captioning(measured, published=published)
    gated = [c for c in checks if c["gated"]]
    assert gated and all(c["pass"] for c in gated), checks
    # and a percent-scale 'measured' dict (the round-4 confusion) now FAILS
    bad = parity.gate_captioning(published, published=published)
    assert not all(c["pass"] for c in bad if c["gated"])


def _report_row(row, measured_vals, ok=True):
    checks = [{"metric": f"m{i}", "measured": v, "gated": True, "pass": False}
              for i, v in enumerate(measured_vals)]
    return {"row": row, "ok": ok, "checks": checks}


def test_dryrun_values_carried_gates_only_learnable_rows():
    """A --rows subset of 1-epoch smoke stand-ins (e.g. 0031) legitimately
    scores 0.00 on every gated metric; that is an execution check, not a
    value-plumbing failure. Only the learnable rows (0006/0102, real training
    budgets) must come back nonzero."""
    # smoke-only subset, all zeros: vacuously carried (no learnable row ran)
    carried, ran = parity.dryrun_values_carried(
        [_report_row("0031", [0.0, 0.0])])
    assert carried is True and ran == []

    # learnable row all-zero → plumbing failure
    carried, ran = parity.dryrun_values_carried(
        [_report_row("0006", [0.0, 0.0]), _report_row("0031", [0.0])])
    assert carried is False and ran == ["0006"]

    # learnable rows nonzero → carried, regardless of zero smoke rows
    carried, ran = parity.dryrun_values_carried(
        [_report_row("0006", [0.0, 20.0]), _report_row("0102", [5.5]),
         _report_row("0031", [0.0])])
    assert carried is True and set(ran) == {"0006", "0102"}

    # a learnable row that FAILED to run doesn't count as having carried
    carried, ran = parity.dryrun_values_carried(
        [{"row": "0006", "ok": False}, _report_row("0031", [0.0])])
    assert carried is True and ran == []  # execution failure is all_ran's job


def test_published_tables_match_baseline_avg():
    """The encoded per-class rows must reproduce the published AVG column
    (BASELINE.md: 52.4 / 55.4 / 30.4 / 54.3 / 55.7) to rounding."""
    avgs = {"0006": 52.4, "0010": 55.4, "0031": 30.4, "0028": 54.3,
            "0042": 55.7}
    for row, avg in avgs.items():
        got = sum(parity.PUBLISHED_F1[row]) / 11.0
        assert abs(got - avg) < 0.15, (row, got, avg)


def test_row_commands_match_documented_flags():
    """The real-mode eval argv must carry the reference's documented flags
    verbatim (reference models/README.md:13-68)."""
    f = parity.ROW_EVAL_FLAGS
    assert f["0006"] == ["--backbone", "DenseNet121"]
    assert "--flow" in f["0010"] and "twos" in f["0010"]
    assert f["0031"][f["0031"].index("--window") + 1] == "8"
    assert f["0031"][f["0031"].index("--data_shape") + 1] == "224"
    for row in ("0028", "0042"):
        assert f[row][f[row].index("--backbone_from_id") + 1] == "0006"
        assert f[row][f[row].index("--feats_model") + 1] == "0006"
    assert "--freeze_backbone" in f["0042"]
    assert f["0102"][f["0102"].index("--num_hidden") + 1] == "256"
    # every row has a dry-run variant and appears in ALL_ROWS
    assert set(f) == set(parity.DRY_EVAL_FLAGS) == set(parity.ALL_ROWS)


def test_cli_rejects_unknown_rows(capsys):
    with pytest.raises(SystemExit):
        parity.main(["--dry-run", "--rows", "9999"])


def test_exec_mode_rejects_unknown_module():
    with pytest.raises(ValueError, match="unknown driver module"):
        parity.main(["--_exec", json.dumps(
            {"module": "nope", "argv": [], "platform": ""})])


def test_relative_root_and_workdir_are_absolutized(tmp_path, monkeypatch):
    """Driver subprocesses run with cwd=workdir; a --root given relative to
    the PARENT's cwd must be absolutized before it reaches them, or every row
    resolves the dataset against the wrong directory (verified end-to-end by
    the --dry-run drive; pinned here without spawning drivers)."""
    import os

    seen = {}

    def fake_run_driver(module, argv, cwd, platform, log_dir, tag):
        seen["cwd"] = cwd
        seen["root"] = next(a for a in argv if a.startswith("--root="))[7:]
        raise RuntimeError("stop after first driver")

    monkeypatch.setattr(parity, "_run_driver", fake_run_driver)
    monkeypatch.chdir(tmp_path)
    (tmp_path / "data" / "frames").mkdir(parents=True)
    rc = parity.main(["--root", "data", "--workdir", "w", "--rows", "0006"])
    assert rc == 1  # the stubbed driver failed; the row reported, not crashed
    assert os.path.isabs(seen["cwd"]) and seen["cwd"] == str(tmp_path / "w")
    assert os.path.isabs(seen["root"]) and seen["root"] == str(
        tmp_path / "data")
