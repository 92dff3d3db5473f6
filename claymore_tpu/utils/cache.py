"""Persistent XLA compilation cache helper.

On the tunneled TPU backend a cold compile of the substep costs minutes
(the remote compile service, not the program: a db=6 toy measures ~150 s
for the XLA oracle and ~200 s for the Pallas path alike).  JAX's
persistent cache turns every repeat compile into a ~1 s deserialize, so
all entry points (bench, CLI, validation scripts, graft entry) opt in by
default.  Library imports do NOT call this — it changes process-global
config, which is the application's call, not the framework's.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jaxcache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX at a persistent on-disk compilation cache.

    Respects an explicit ``JAX_COMPILATION_CACHE_DIR`` if the user set one;
    otherwise defaults to ``<repo>/.jaxcache`` (gitignored).  Safe to call
    before or after the backend initializes, and idempotent.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even fast compiles: the dominant cost here is the remote
    # round trip, which the min-compile-time heuristic cannot see.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
