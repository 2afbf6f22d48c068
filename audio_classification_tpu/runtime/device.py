"""Device/runtime configuration helpers."""
from __future__ import annotations

import os
from pathlib import Path

_CACHE_ENABLED = False


def stabilize_pallas_cache_keys() -> bool:
    """Strip source locations from Mosaic (Pallas) kernel payloads.

    The serialized Mosaic module embedded in each ``tpu_custom_call``
    records the full Python call stack — file paths AND line numbers of
    every frame from the kernel body up to the entry script. That payload
    is hashed into XLA's persistent-compilation-cache key, so editing ANY
    file in the call chain (or invoking the same pipeline from a different
    script) silently invalidates every cached stage program that contains
    the Pallas fbank: measured as full ~10-minute warmup recompiles after
    one-line edits. Running MLIR's ``strip-debuginfo`` pass on the module
    before serialization makes the payload a pure function of the kernel
    computation, restoring cross-process/cross-edit cache hits. The only
    cost is file:line info in Mosaic compile diagnostics.
    """
    try:
        from jax._src import tpu_custom_call as tcc
        from jaxlib.mlir.passmanager import PassManager
    except Exception:
        return False
    if getattr(tcc, "_act_strip_debuginfo", False):
        return True
    orig = tcc._lower_mosaic_module_to_asm

    def lower_stripped(module, **kw):
        try:
            with module.context:
                PassManager.parse(
                    "builtin.module(strip-debuginfo)").run(module.operation)
        except Exception:
            pass  # diagnostics-only feature: never block lowering
        return orig(module, **kw)

    tcc._lower_mosaic_module_to_asm = lower_stripped
    tcc._act_strip_debuginfo = True
    return True


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
    stabilize_pallas_cache_keys()
    _CACHE_ENABLED = True
    return cache_dir


def device_kind() -> str:
    import jax

    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"
