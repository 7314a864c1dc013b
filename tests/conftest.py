"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware (matches the driver's
multi-chip dry-run environment).

NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
var — forcing CPU requires jax.config.update("jax_platforms", "cpu")."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# RUN_TPU=1 keeps the real accelerator visible so the Pallas kernel parity
# tests (test_warp / test_atrous_kernel / test_dda kernel twin / tri kernel)
# run on hardware — the bench environment executes this mode and commits the
# outcome to data/perf/ (VERDICT r2 item 10).  Default: CPU, 8 virtual
# devices (the driver's multi-chip dry-run environment).
if not os.environ.get("RUN_TPU"):
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache — jit compiles are slow in this environment
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
