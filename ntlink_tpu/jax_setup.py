"""Process-wide JAX configuration for the engine.

Persistent compilation cache: the mapping/sketch kernels compile once per
(shape-bucket, params) — cache them on disk so repeat runs (and the bench's
retry subprocesses) skip XLA compilation entirely. Opt out with
NTLINK_NO_JAX_CACHE=1; relocate with NTLINK_JAX_CACHE_DIR.
"""
from __future__ import annotations

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("NTLINK_NO_JAX_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "NTLINK_JAX_CACHE_DIR", os.path.expanduser("~/.cache/ntlink-jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
