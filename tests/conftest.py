"""Test configuration: force CPU with 8 virtual devices so sharding/pjit
tests run without TPU hardware (SURVEY.md §4.3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# the axon sitecustomize force-selects the TPU platform; override back to CPU
# before any backend is initialized
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
