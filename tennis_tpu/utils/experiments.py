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


# FileHandlers THIS module installed, so re-invocation cleanup never touches
# handlers owned by user code or the embedding application
_own_file_handlers: list[logging.FileHandler] = []


def setup_logging(exp_dir: str, flags_dict: dict | None = None):
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    # in-process re-invocation hygiene (examples/full_pipeline.py chains
    # drivers): absl's --verbosity flag re-parse resets the 'absl' logger to
    # WARNING (verbosity -1), silently dropping every INFO line of the second
    # run — raise it back to INFO, but only when it sits BELOW info so an
    # explicit --verbosity=1 (debug) request survives; and drop only the
    # FileHandlers this function itself installed, so lines stop duplicating
    # into stale experiment logs without clobbering foreign handlers
    try:
        from absl import logging as absl_logging

        if absl_logging.get_verbosity() < absl_logging.INFO:
            absl_logging.set_verbosity(absl_logging.INFO)
    except ImportError:  # pragma: no cover
        pass
    for h in _own_file_handlers:
        logger.removeHandler(h)
        h.close()
    _own_file_handlers.clear()
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        logger.addHandler(logging.StreamHandler())
    fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    _own_file_handlers.append(fh)
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
