"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
logic runs without a pod (SURVEY.md §4).

Note: this environment's sitecustomize pre-imports jax (axon TPU plugin), so
env vars alone don't switch platforms — we must update jax.config after
import, before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
