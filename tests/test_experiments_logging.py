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


def test_explicit_debug_verbosity_survives(tmp_path):
    """A user-requested --verbosity=1 (debug) must not be clobbered back to
    INFO: setup_logging only RAISES verbosity that fell below INFO."""
    os.makedirs(tmp_path / "e")
    prev = absl_logging.get_verbosity()
    try:
        absl_logging.set_verbosity(absl_logging.DEBUG)
        setup_logging(str(tmp_path / "e"))
        assert absl_logging.get_verbosity() == absl_logging.DEBUG
    finally:
        absl_logging.set_verbosity(prev)


def test_foreign_file_handler_untouched(tmp_path):
    """Only FileHandlers setup_logging itself installed are removed on
    re-invocation; a handler owned by the embedding application survives."""
    os.makedirs(tmp_path / "e1")
    os.makedirs(tmp_path / "e2")
    foreign_path = str(tmp_path / "app.log")
    foreign = logging.FileHandler(foreign_path)
    root = logging.getLogger()
    root.addHandler(foreign)
    try:
        setup_logging(str(tmp_path / "e1"))
        setup_logging(str(tmp_path / "e2"))
        assert foreign in root.handlers, "foreign FileHandler was removed"
        logging.getLogger().info("kept line")
        foreign.flush()
        assert "kept line" in open(foreign_path).read()
    finally:
        root.removeHandler(foreign)
        foreign.close()
