"""Test configuration: run on CPU with 8 virtual devices.

Tests validate numerics (f64) and multi-chip sharding logic without TPU
hardware; the bench path runs the same code on the real chip.

Note: env-var JAX_PLATFORMS is NOT sufficient here — a site-customization
may pre-register a TPU platform plugin at interpreter start and pin the
platform. ``jax.config.update("jax_platforms", ...)`` still wins as long as
no backend has been initialized, so we do both, before any test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
