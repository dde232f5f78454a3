"""Runtime/platform setup helpers."""

from __future__ import annotations

import os
from pathlib import Path

import jax

_cache_enabled = False


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    Compiles over the remote-TPU tunnel cost tens of seconds; the cache cuts
    warm-process startup to <1s.  Safe to call multiple times.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    cache_dir = Path(path or os.environ.get(
        "SPECTRALAE_JAX_CACHE",
        Path(__file__).resolve().parents[2] / ".jax_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _cache_enabled = True


def cache_dir() -> Path:
    """The compile-cache directory (whether or not it is enabled yet)."""
    return Path(os.environ.get(
        "SPECTRALAE_JAX_CACHE",
        Path(__file__).resolve().parents[2] / ".jax_cache"))
