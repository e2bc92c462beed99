"""Persistent-compile-cache bring-up that works when jax is pre-imported.

This container pre-imports jax at interpreter startup (the axon TPU-tunnel
plugin loads via site hooks), so setting JAX_COMPILATION_CACHE_DIR through
``os.environ`` in a script runs AFTER jax's config has already read the
environment — the cache silently stays disabled ("Not writing persistent
cache entry ... cache is disabled/not initialized" at debug level). That
no-op cost every TPU tool in this repo a full recompile per process — ~13
minutes for the stage-1 train step through the tunnel — and is the root
cause of round 4's driver-bench timeout (VERDICT.md r4 missing #1).

``jax.config.update`` works at any point before the first compilation, so
every on-chip entry point (bench.py, tools/bench_*.py, tools/profile_*.py,
__graft_entry__.py) calls :func:`enable_persistent_cache` right after
importing jax instead of relying on env vars.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/root/.cache/jax_tpu_cache"


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at ``path`` (created if
    missing) regardless of whether jax was imported before the caller could
    set JAX_COMPILATION_CACHE_DIR. Returns the cache dir in effect."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get(
                              "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                              min_compile_secs)))
    except Exception:  # option renamed on some jax versions — cache still on
        pass
    return path
