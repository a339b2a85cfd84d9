"""Runtime utilities: checkpointing, experiment dirs, logging, visualisation."""
from __future__ import annotations

import time
from contextlib import contextmanager


@contextmanager
def print_time(task: str):
    """Log the wall-clock duration of a block (reference
    utils/embeddings/utils.py:26-33, same log phrasing)."""
    from absl import logging

    start = time.time()
    logging.info("Starting to %s", task)
    yield
    logging.info("Finished to %s in %.2f seconds", task, time.time() - start)
