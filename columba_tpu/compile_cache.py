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

    if jax.default_backend() == "cpu":
        # XLA:CPU executable serialization segfaults on some of the
        # executor's programs (observed in-suite, jax 0.7 era), and CPU
        # compiles are fast enough that the cache buys little. The cache
        # exists for the remote-compile TPU path.
        return None

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache EVERYTHING, including sub-second tiny eager ops. On a
    # remote-compile backend (axon tunnel) even a jit_iota costs ~0.45 s
    # of compile RTT, and a CLI start dispatches ~200 distinct eager ops
    # -> ~100 s of per-process compile hidden below jax's default 1 s
    # floor (measured round 3; the floor exists for local backends where
    # sub-second compiles are cheaper than disk reads).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _patch_atomic_put()
    _enabled = True
    return cache_dir


def _patch_atomic_put() -> None:
    """Make jax's on-disk cache writes atomic (tmp file + rename).

    jax's LRUCache.put writes entries with a plain write_bytes; a process
    killed mid-write (timeouts, OOM kills) leaves a TRUNCATED entry, and
    deserializing a truncated executable crashes every later process that
    reads it. Writing to a temp file and os.replace()-ing closes the hole.
    """
    try:
        from jax._src import lru_cache as _lru
    except ImportError:  # pragma: no cover - jax internals moved
        return
    cls = getattr(_lru, "LRUCache", None)
    if cls is None or getattr(cls, "_columba_atomic", False):
        return
    orig_put = cls.put

    def atomic_put(self, key, val):
        import pathlib
        import tempfile

        path = getattr(self, "path", None)
        if path is None:
            return orig_put(self, key, val)
        try:
            fd, tmp = tempfile.mkstemp(dir=str(path), suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(val)
            target = pathlib.Path(path) / f"{key}-cache"
            if target.exists():
                os.unlink(tmp)
                return
            os.replace(tmp, target)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    cls.put = atomic_put
    cls._columba_atomic = True
