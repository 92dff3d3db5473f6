"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the reference
has no test suite at all — SURVEY.md section 4).

A pytest plugin in this environment imports jax before conftest runs, so
setting JAX_PLATFORMS via os.environ is too late; jax.config.update works
as long as no backend has been initialized yet.
"""

import os

# for any subprocesses spawned by tests
os.environ["JAX_PLATFORMS"] = "cpu"

# The suite is compile-bound on one CPU core: XLA's backend optimization
# passes buy nothing for correctness tests and cost ~20-35% of the wall
# time (test_regrow 40.4s -> 26.9s).  Every equivalence test still passes
# at level 0 (both sides of each comparison compile with the same flags).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_backend_optimization_level=0").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
