"""Persistent XLA compilation cache.

TPU compiles of the full render/train programs take 2-5 minutes per static
configuration (shape bucket); the cache makes every repeat invocation —
across processes and restarts — reuse the compiled executable from disk.
The reference has no analogue (PyTorch eager + precompiled CUDA); this is
TPU-runtime plumbing the framework owns (SURVEY.md §5 aux subsystems).
"""

from __future__ import annotations

import os


def enable(path: str | None = None,
           min_compile_time_secs: float = 2.0) -> str:
    """Turn on the on-disk compilation cache (idempotent). Returns the dir."""
    import jax

    cache_dir = os.path.expanduser(
        path or os.environ.get("D3G_COMPILE_CACHE",
                               "~/.cache/d3g_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # flag name varies across jax versions
        pass
    return cache_dir
