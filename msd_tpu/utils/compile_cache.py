"""Persistent XLA compilation cache.

Remote TPU compiles through the axon relay cost tens of seconds each; the
persistent cache makes every CLI invocation after the first fast. Called by
bench.py and the CLI entry points.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Hash of the host CPU feature set.

    XLA:CPU persists AOT results specialized to the compiling machine's
    ISA extensions; loading them on a host with different features warns
    "could lead to execution errors such as SIGILL" (and has wedged CPU
    execution outright when this environment was re-provisioned).
    Scoping the cache dir per CPU fingerprint auto-invalidates on a host
    change. TPU entries are keyed by device kind inside XLA already, but
    sharing the directory is harmless.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: str | None = None):
    import jax

    cache_dir = cache_dir or os.environ.get("MSD_TPU_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~/.cache/msd_tpu_xla"), _host_fingerprint()
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # older jax without these flags
        pass
