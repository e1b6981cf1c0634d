"""Process-wide JAX configuration for the device compute path.

Every module that jits (ops/*, genotyping/batched.py, parallel/*) calls
``configure()`` at import. The persistent compilation cache matters in
production: the graph-SW kernels are recompiled per (L, M, B) shape
bucket, and an uncached kernel compile through the remote-compile tunnel
costs seconds to minutes — a cold pipeline run without the cache was
measured 5-25x slower end-to-end than a warm one.

Opt out with PARAGRAPH_TPU_NO_CACHE=1 (e.g. read-only filesystems);
override the location with PARAGRAPH_TPU_CACHE_DIR.
"""
from __future__ import annotations

import os

_configured = False


def configure() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("PARAGRAPH_TPU_NO_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # respect an explicit user setting
    cache_dir = os.environ.get("PARAGRAPH_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "paragraph_tpu", "jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
