"""Dead-tunnel guards for the axon TPU.

The tunneled axon TPU plugin HANGS inside backend registration when the tunnel
is down (observed outages >2 h) — ``jax.devices()`` never returns and never
errors — so any entry point that touches a jax backend must either probe the
tunnel in a bounded subprocess first (this module) or wrap its first device
call in a watchdog thread (bench.py's zero-overhead variant for the
wall-clock-budgeted benchmark).
"""
from __future__ import annotations

import sys


def tpu_reachable(timeout_s: float = 150.0) -> bool:
    """Probe the tunneled axon TPU in a SUBPROCESS with a hard timeout.

    The probe subprocess inherits sitecustomize and hangs the same way the
    caller would; we bound it. True iff a non-CPU backend registered in time.
    """
    import subprocess

    code = ("import jax; ds = jax.devices(); "
            "assert any('cpu' not in str(d.platform).lower() for d in ds), ds; "
            "print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def ensure_live_backend(timeout_s: float = 150.0) -> bool:
    """Pin jax to CPU if the tunneled TPU is unreachable. Idempotent.

    No-op (returns True) when a backend is already initialized — the config
    can no longer change it, and an initialized backend means registration
    already survived. Returns False when the probe failed and the CPU pin was
    applied, so callers can log the fallback.
    """
    import jax
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        return True
    if tpu_reachable(timeout_s):
        return True
    jax.config.update("jax_platforms", "cpu")
    return False
