"""Persistent XLA compilation cache (compiles of the flagship graphs take
minutes; cached reloads take seconds). Enabled by every CLI entry point;
library users call `enable_compile_cache()` themselves."""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.environ.get("FACODEC_COMPILE_CACHE", "~/.cache/facodec_tpu/xla")


def _machine_tag() -> str:
    """Fingerprint of the host CPU. `jax_persistent_cache_enable_xla_caches
    = all` also caches CPU AOT executables, whose cache key does NOT cover
    host CPU features — an entry written on one machine can SIGILL worker
    threads on another (observed: 8-device CPU-mesh collective rendezvous
    abort after 'Target machine feature +prefer-no-scatter is not supported'
    loads from a cache dir that outlived its VM). Segregating the cache per
    machine makes stale entries unreachable instead of fatal."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            # x86 lists features under "flags", aarch64 under "Features"
            flags = next(
                (l for l in f.read().splitlines()
                 if l.startswith(("flags", "Features"))), "",
            )
    except OSError:
        pass
    if not flags:
        import platform

        flags = f"{platform.machine()}/{platform.processor()}"
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_compile_cache(path: str = _DEFAULT_DIR) -> str:
    import jax

    path = os.path.join(os.path.expanduser(path), _machine_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
    return path
