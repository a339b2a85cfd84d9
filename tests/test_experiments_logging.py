"""setup_logging must survive in-process driver re-invocation.

Two hazards (both observed driving examples/full_pipeline.py-style chains):
absl's --verbosity machinery can leave the 'absl' logger at WARNING after a
flag (re-)parse (verbosity default -1), silently dropping the next run's INFO
lines; and a leaked FileHandler from run 1 duplicates run 2's lines into run
1's log.txt.
"""
import logging
import os

from absl import logging as absl_logging

from tennis_tpu.utils.experiments import setup_logging


def test_second_invocation_keeps_absl_info_and_does_not_leak(tmp_path):
    exp1, exp2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    os.makedirs(exp1)
    os.makedirs(exp2)

    setup_logging(exp1)
    absl_logging.info("first-run line")

    # what a driver main()'s FLAGS.unparse_flags()/FLAGS(argv) cycle does to
    # the absl logger (verbosity -1 → WARNING), reproduced deterministically
    absl_logging.set_verbosity(absl_logging.WARNING)
    assert logging.getLogger("absl").getEffectiveLevel() >= logging.WARNING

    setup_logging(exp2)
    absl_logging.info("second-run line")

    log1 = open(os.path.join(exp1, "log.txt")).read()
    log2 = open(os.path.join(exp2, "log.txt")).read()
    assert "first-run line" in log1
    assert "second-run line" in log2, "absl INFO dropped after flag re-parse"
    assert "second-run line" not in log1, "stale FileHandler leaked across runs"
