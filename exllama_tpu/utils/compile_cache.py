"""Persistent XLA compilation cache setup.

First compiles through the axon remote-compile tunnel cost minutes; the
persistent cache makes them one-time per (program, shape). Enabled by
default under ``~/.cache/exllama_tpu_jax``; override with
EXLLAMA_TPU_CACHE_DIR, disable with EXLLAMA_TPU_CACHE_DIR=off.
"""

from __future__ import annotations

import os

_initialized = False


def _host_tag() -> str:
    """Short fingerprint of this host's CPU features.

    XLA:CPU AOT cache entries do NOT key on CPU features: loading an entry
    compiled on a host with different features logs machine-mismatch
    errors and can SIGILL (cpu_aot_loader.cc) — observed with a shared
    cache dir surviving across differently-featured machines. Partitioning
    the cache per feature-set keeps reuse where it is safe."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def _boot_tag() -> str:
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            return f.read().strip().replace("-", "")[:12]
    except OSError:
        return "noboot"


def init_compilation_cache():
    global _initialized
    if _initialized:
        return
    _initialized = True
    target = os.environ.get("EXLLAMA_TPU_CACHE_DIR")
    if target == "off":
        return
    if not target:
        import jax

        plat = (
            getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS", "")
            or ""
        )
        if "cpu" in plat:
            # No persistent cache on the CPU backend at all: XLA:CPU AOT
            # (de)serialization segfaulted mid-suite in BOTH directions in
            # round 5 — loading entries from a differently-featured host
            # (cpu_aot_loader machine-mismatch → SIGILL/SEGV) and WRITING
            # entries for multi-device shard_map executables
            # (put_executable_and_time SEGV). CPU compiles are cheap;
            # correctness beats warm starts.
            return
        else:
            # TPU entries are target (TPU) code — safe across hosts; keep
            # the host partition anyway for any CPU executables a TPU
            # process compiles alongside.
            target = os.path.expanduser(
                "~/.cache/exllama_tpu_jax/" + _host_tag()
            )
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
