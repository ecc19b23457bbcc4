"""Persistent XLA compilation cache setup.

DeepLabV3-RN101 at 512² costs ~5 min of XLA compile on a small host; the
persistent cache makes every subsequent process reuse it.  Called from
main.py / bench.py / __graft_entry__.py before any tracing.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "BACS_COMPILE_CACHE", os.path.expanduser("~/.cache/bacs_jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
