"""Persistent XLA compilation cache.

First compile of the serving/offline graphs is expensive (tens of seconds;
minutes when the chip compiles remotely). The cache makes it once-per-
machine instead of once-per-process. Called by every CLI entry point and
the benchmark; no-op if the cache is already configured.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "audio_denoising_tpu", "xla")


def enable_compilation_cache(path: str = "") -> str:
    import jax

    path = (path or os.environ.get("ADT_COMPILATION_CACHE")
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything, even fast compiles — dispatch dominates here.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: flag names differ; cache is best-effort
    return path
