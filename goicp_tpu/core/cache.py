"""Persistent XLA compilation cache.

First TPU compiles run 20-40 s each; the reference pays nothing comparable
(nvcc compiles at build time).  Enabling JAX's on-disk executable cache makes
every process after the first start warm — the TPU analogue of shipping
compiled fatbins.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/goicp_tpu_xla")
_enabled = False


def enable_persistent_cache(path: str | None = None):
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = path or os.environ.get("GOICP_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
