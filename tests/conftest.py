"""Test configuration: force CPU with 8 virtual devices so sharding/pjit
tests run without TPU hardware (SURVEY.md §4.3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# single-core hosts time-slice the 8 virtual device threads; XLA's default
# 40s collective-rendezvous abort is far too tight there
if "collective_call_terminate" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402  (import after env setup)

# the axon sitecustomize force-selects the TPU platform; override back to CPU
# before any backend is initialized
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the 8-virtual-device train/eval step compiles
# take minutes each on a few-core host and dominate suite runtime; warm
# reruns hit the cache (keyed on HLO, so source edits that change the
# computation still recompile)
_cache_dir = os.environ.get(
    "SIU3R_JAX_CACHE_DIR",  # override: cold-cache timing runs (README)
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass  # older jax without these knobs
