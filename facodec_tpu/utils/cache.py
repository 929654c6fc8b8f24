"""Persistent XLA compilation cache (compiles of the flagship graphs take
minutes; cached reloads take seconds). Enabled by every CLI entry point;
library users call `enable_compile_cache()` themselves."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("FACODEC_COMPILE_CACHE", "~/.cache/facodec_tpu/xla")


def enable_compile_cache(path: str = _DEFAULT_DIR) -> str:
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
    return path
