"""Persistent XLA compilation cache.

Remote TPU compiles through the axon relay cost tens of seconds each; the
persistent cache makes every CLI invocation after the first fast. Called by
bench.py and the CLI entry points.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "MSD_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/msd_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
