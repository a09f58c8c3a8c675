"""JAX runtime setup helpers shared by the CLIs and benchmarks."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist XLA compilations across processes (first compile of the
    full-size train step costs minutes; subsequent runs hit the cache).

    Honors JAX_COMPILATION_CACHE_DIR; defaults to ~/.cache/aae_tpu_xla.
    Safe to call multiple times and before/after jax import.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/aae_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
