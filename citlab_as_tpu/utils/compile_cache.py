"""Persistent XLA compilation cache setup.

Compiles over the axon tunnel run on a remote compile service and cost
minutes per program (a trivial jit measured 124.7 s cold vs 2.3 s from the
cache on this container); the on-disk cache makes every program after the
first process-lifetime essentially free. Call :func:`enable` before the
first jit dispatch (safe to call any time — jax config updates apply to
subsequent compiles).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable(cache_dir: str = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    <repo>/.jax_cache, surviving across benchmark/driver runs). Honors an
    already-set JAX_COMPILATION_CACHE_DIR env var."""
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
