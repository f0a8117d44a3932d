"""Persistent XLA compilation cache for every entry point.

Flagship-scale programs take 30-60 min to compile on the remote TPU
compile service; without a persistent cache a crashed or restarted run
pays that again. Every script/bench entry point calls this before the
first trace. (The reference has no analog — torch eager pays no compile.)
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    """Point JAX's compilation cache at a repo-local dir (idempotent)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, including fast-compiling programs: the remote
    # compile service round trip dwarfs the default 1 s threshold
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
