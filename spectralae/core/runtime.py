"""Runtime/platform setup helpers."""

from __future__ import annotations

import os
from pathlib import Path

import jax

_cache_enabled = False
_cache_path: Path | None = None


def enable_compilation_cache(path: str | os.PathLike | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    Compiles over the remote-TPU tunnel cost tens of seconds; the cache cuts
    warm-process startup to <1s.  Safe to call multiple times.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    global _cache_path
    cache_dir = Path(path or os.environ.get(
        "SPECTRALAE_JAX_CACHE",
        Path(__file__).resolve().parents[2] / ".jax_cache"))
    _cache_path = cache_dir
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _cache_enabled = True


def cache_dir() -> Path:
    """The compile-cache directory actually in use (the explicit path
    given to :func:`enable_compilation_cache` wins over env/default)."""
    if _cache_path is not None:
        return _cache_path
    return Path(os.environ.get(
        "SPECTRALAE_JAX_CACHE",
        Path(__file__).resolve().parents[2] / ".jax_cache"))
