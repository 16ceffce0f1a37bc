"""Test harness: hermetic 8-device virtual CPU mesh.

This image's sitecustomize imports jax and force-registers an `axon`
TPU-tunnel PJRT plugin in every interpreter (and overrides JAX_PLATFORMS),
so env vars set here are too late — but backends initialise lazily, so
flipping `jax_platforms` via jax.config before first use keeps tests off the
tunnel entirely.  8 virtual CPU devices exercise the sharding/collective
paths without TPU hardware (survey §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
