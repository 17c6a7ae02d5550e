"""Persistent XLA compilation cache (big UX win: the ViT-B train step costs
20-60 s to compile; cached binaries make reruns/restarts near-instant)."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OATX_COMPILE_CACHE", os.path.expanduser("~/.cache/oatx_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
