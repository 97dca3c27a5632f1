"""Persistent XLA compilation cache.

TPU compiles in this environment run through a remote tunnel and cost
30-400 s per executable; the persistent cache makes every shape after the
first session free. Call before the first jit execution.
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str = DEFAULT_CACHE_DIR) -> None:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
