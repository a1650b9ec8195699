"""Persistent XLA compilation cache (VERDICT r2 task #2).

The packed-key binning sort alone costs ~18s of XLA compile at 100k
gaussians and the full fwd+bwd train step ~60s; with the persistent cache
that cost is paid once per machine ever — warm starts reload compiled
programs from disk in ~1-2s. Every entry point (bench, CLIs, viewer,
profiling scripts) calls :func:`enable` before building jitted programs.

Reference analogue: none (the reference's shaders compile in milliseconds);
this is a TPU-operational concern (SURVEY.md section 5.1/5.5).
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Directory resolution order: explicit arg, $GSPLAT_COMPILE_CACHE,
    ~/.cache/gsplat_tpu/xla. Set GSPLAT_COMPILE_CACHE=0 to disable.
    """
    global _enabled
    env = os.environ.get("GSPLAT_COMPILE_CACHE")
    if env == "0":
        return ""
    if env is None and os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU-only runs (tests, virtual meshes) compile fast and XLA:CPU AOT
        # cache loads warn about tuning pseudo-features; cache TPU only
        # unless explicitly requested via GSPLAT_COMPILE_CACHE=<dir>.
        return ""
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "gsplat_tpu", "xla")
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >=1s to compile, regardless of size
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
