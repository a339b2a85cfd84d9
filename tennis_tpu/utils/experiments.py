"""Experiment directory + logging conventions (reference train.py:107-121).

Each experiment lives at ``models/vision/experiments/<model_id>/`` (or
``models/captioning/experiments/<model_id>/``) with:

- ``log.txt``       file log, including the serialized flag set at startup — the
                    de-facto experiment manifest (reference train.py:117-118);
- ``tb/``           TensorBoard event files (tensorboardX);
- checkpoints and ``scores.txt`` per tennis_tpu.utils.checkpoint.
"""
from __future__ import annotations

import logging
import os


def experiment_dir(kind: str, model_id: str, base: str = ".") -> str:
    assert kind in ("vision", "captioning", "embeddings")
    d = os.path.join(base, "models", kind, "experiments", model_id)
    os.makedirs(d, exist_ok=True)
    return d


def setup_logging(exp_dir: str, flags_dict: dict | None = None):
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    # in-process re-invocation hygiene (examples/full_pipeline.py chains
    # drivers): absl's --verbosity flag re-parse resets the 'absl' logger to
    # WARNING (verbosity -1), silently dropping every INFO line of the second
    # run — pin it back to INFO; and drop the previous run's FileHandler so
    # lines stop duplicating into stale experiment logs
    try:
        from absl import logging as absl_logging

        absl_logging.set_verbosity(absl_logging.INFO)
    except ImportError:  # pragma: no cover
        pass
    for h in list(logger.handlers):
        if isinstance(h, logging.FileHandler):
            logger.removeHandler(h)
            h.close()
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        logger.addHandler(logging.StreamHandler())
    fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    if flags_dict:
        logging.info(
            "flags:\n%s",
            "\n".join(f"--{k}={v}" for k, v in sorted(flags_dict.items())),
        )
    return logger


def summary_writer(exp_dir: str):
    """tensorboardX writer under <exp_dir>/tb (reference train.py:121)."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:  # pragma: no cover
        return None
    return SummaryWriter(log_dir=os.path.join(exp_dir, "tb"))
