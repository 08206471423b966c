"""Persistent XLA compilation cache (checkpoint/resume equivalent for
compiles; SURVEY.md section 5).

The axon-tunneled TPU compile takes minutes per program; caching compiled
executables across processes makes repeat CLI/bench runs start in seconds.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

DEFAULT_DIR = os.path.expanduser("~/.cache/auditory_tpu/xla")


def enable_compilation_cache(path: str = DEFAULT_DIR) -> str:
    """Enable the persistent compilation cache; returns the cache dir."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
