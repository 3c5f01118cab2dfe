"""Persistent XLA compilation cache.

The development tunnel compiles the same program in 5 s or 600+ s depending
on the hour (CLAUDE.md); the persistent cache makes every entry point pay a
slow compile at most ONCE per program shape. bench.py, the CLI, and the
render service all route through here so they share one cache directory.

Reference analog: none — the reference is an AOT-compiled C++ binary; this
is the JIT-world equivalent of shipping a compiled executable.
"""

from __future__ import annotations

import os
from pathlib import Path


def default_cache_dir() -> str:
    env = os.environ.get("GAMER_TPU_COMPILE_CACHE")
    if env:
        return env
    root = Path(__file__).resolve().parents[2]
    if (root / "pyproject.toml").exists() and os.access(root, os.W_OK):
        return str(root / ".jax_cache")
    return str(Path.home() / ".cache" / "gamer_tpu" / "jax")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache. Idempotent; safe to
    call before any compile. Returns the cache dir, or None if the jax
    config rejected it (old jax — degrade to uncached compiles)."""
    import jax

    path = path or default_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache everything: the point is surviving the tunnel's slow-compile
        # hours, and even "fast" TPU compiles cost seconds over the link.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 - unknown config name on old jax
        return None
    return str(path)
