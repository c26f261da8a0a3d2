"""Test configuration: force CPU JAX with 8 virtual devices.

Tests must run without TPU hardware; multi-device sharding tests use the
virtual CPU mesh (the TPU-native analog of the reference's absent multi-node
test story — SURVEY.md §4).

NOTE: this environment's sitecustomize force-registers the `axon` TPU plugin
and overrides `jax_platforms` at import time, so the env var alone is not
enough — the config must be updated again after importing jax, before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: identical jitted programs (e.g. train steps
# built by different Trainer instances across tests) compile once per machine
# instead of once per test.
jax.config.update("jax_compilation_cache_dir", "/tmp/ldt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
