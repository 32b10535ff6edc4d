"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
logic runs without a pod (SURVEY.md §4).

Note: this environment's sitecustomize pre-imports jax (axon TPU plugin), so
env vars alone don't switch platforms — we must update jax.config after
import, before any backend is touched.
"""

import os

if os.environ.get("CHATTERBOX_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # CHATTERBOX_TEST_TPU=1: keep the real backend so @tpu-marked tests run
    # compiled (Pallas kernels, quantized matmuls) on hardware.
    import jax  # noqa: F401
