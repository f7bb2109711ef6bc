"""Persistent XLA compilation cache setup.

First compiles through the axon remote-compile tunnel cost minutes; the
persistent cache makes them one-time per (program, shape). Enabled by
default under ``~/.cache/exllama_tpu_jax``; override with
EXLLAMA_TPU_CACHE_DIR, disable with EXLLAMA_TPU_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_initialized = False


def init_compilation_cache():
    global _initialized
    if _initialized:
        return
    _initialized = True
    target = os.environ.get("EXLLAMA_TPU_CACHE_DIR")
    if target == "off":
        return
    if not target:
        target = os.path.expanduser("~/.cache/exllama_tpu_jax")
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
