"""Test configuration: force an 8-device virtual CPU mesh before JAX initialises.

This is the TPU-native analogue of "test multi-node without a cluster": all sharding
(DP over the batch axis, and any model axes) is exercised on host CPU devices, so the
suite runs anywhere. Real-TPU numerics are covered by bench.py on hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
