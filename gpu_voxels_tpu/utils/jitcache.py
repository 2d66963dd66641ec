"""Persistent XLA compilation cache setup.

On the relayed TPU backend, large-grid programs go through a remote compiler
and cold compiles cost 0.5 s - 4.5 min EACH (docs/PERFORMANCE.md "API dispatch
latency"); measured on this backend, a warm persistent cache turns the same
compile into <1 s. Enabling the cache makes every repeat run of bench.py and
the tests_tpu/ hardware tier compile-free: only the one-time relay connection
(~3-5 min at first dispatch) remains.

The cache directory defaults to `<repo>/.jax_cache` (gitignored) so driver
re-runs from the same checkout share it; override with GVTPU_JAX_CACHE
(set it empty to disable).
"""
from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_cache(default_dir: str | os.PathLike | None = None) -> str | None:
    """Point jax at a persistent compilation cache; returns the dir or None.

    Safe to call multiple times and before/after backend init (jax only
    consults the config at compile time). Never raises: an old jax without
    the knobs simply runs uncached.
    """
    cache_dir = os.environ.get("GVTPU_JAX_CACHE")
    if cache_dir is None:
        base = default_dir or Path(__file__).resolve().parents[2] / ".jax_cache"
        cache_dir = str(base)
    if not cache_dir:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >=1s to compile: the relay's remote
        # compiles are the target, trivial host programs aren't worth disk
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
