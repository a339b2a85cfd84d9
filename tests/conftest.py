"""Test configuration: force an 8-device virtual CPU mesh before any JAX use.

This is the TPU-native analogue of "test multi-node without a cluster": all sharding
(DP over the batch axis, and any model axes) is exercised on host CPU devices, so the
suite runs anywhere. Real-TPU numerics are covered by bench.py on hardware.

Environment quirk: the session boots with a sitecustomize that registers the tunneled
'axon' TPU backend and sets ``jax_platforms=axon,cpu`` *before* this file runs, so
plain env vars cannot switch the platform — ``jax.config.update`` can and does.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (after XLA_FLAGS; backends are still uninitialised)

jax.config.update("jax_platforms", "cpu")

# XLA:CPU's default matmul precision in this environment is bf16-class (~1e-2 rel
# error); numeric cross-checks against numpy need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
