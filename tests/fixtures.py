"""Synthetic TenniSet fixture for the test suite.

The builder itself lives in the package (tennis_tpu.data.synthetic) so the
``tennis_tpu.parity --dry-run`` harness can use it at runtime; this module
keeps the historical test-side import surface.
"""
from tennis_tpu.data.synthetic import (  # noqa: F401
    CLASSES,
    POINTS,
    VIDEO_EVENTS,
    build_fixture,
    frame_label,
)
