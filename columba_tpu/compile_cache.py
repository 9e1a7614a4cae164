"""Persistent XLA compilation cache.

The frontier executor compiles one program per (read length, scheme, k,
batch size) — 30-300 s each on the TPU remote-compile path. The reference
pays nothing comparable (C++ AOT), so without a persistent cache every CLI
invocation eats the warmup again. Enabling JAX's disk cache makes the cost
once-per-machine instead of once-per-process.

Call ``enable()`` before the first jit dispatch (the CLI and bench do).
Opt out with COLUMBA_TPU_NO_COMPILE_CACHE=1; override the location with
COLUMBA_TPU_COMPILE_CACHE=<dir> (default ~/.cache/columba_tpu/xla).
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> str | None:
    """Configure jax's persistent compilation cache (idempotent).

    Returns the cache dir, or None when disabled by env."""
    global _enabled
    if os.environ.get("COLUMBA_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get(
        "COLUMBA_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "columba_tpu",
                     "xla"))
    if _enabled:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time; the executor's
    # programs all do
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
