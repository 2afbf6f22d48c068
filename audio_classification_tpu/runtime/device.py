"""Device/runtime configuration helpers."""
from __future__ import annotations

import os
from pathlib import Path

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str = "") -> str:
    """Turn on JAX's persistent compilation cache.

    Compiled XLA programs persist across processes, so pipeline warmup after
    the first-ever run drops from minutes (fresh compile of every
    stage x bucket x batch program) to seconds. Safe to call repeatedly.
    """
    global _CACHE_ENABLED
    cache_dir = cache_dir or os.environ.get(
        "ACT_COMPILATION_CACHE", str(Path.home() / ".cache" / "act_xla_cache")
    )
    if _CACHE_ENABLED:
        return cache_dir
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _CACHE_ENABLED = True
    return cache_dir


def device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"
