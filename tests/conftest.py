"""Test configuration: force CPU JAX with 8 virtual devices.

Tests must run without TPU hardware; multi-device sharding tests use the
virtual CPU mesh (the TPU-native analog of the reference's absent multi-node
test story — SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
