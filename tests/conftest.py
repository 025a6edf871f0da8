"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware (the reference has no multi-device tests at all; see
SURVEY.md §4).

Note: this machine pre-imports jax via sitecustomize (axon TPU tunnel), so
setting env vars here is too late for jax itself — we must go through
jax.config before any backend is initialized.
"""
import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
