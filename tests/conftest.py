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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
