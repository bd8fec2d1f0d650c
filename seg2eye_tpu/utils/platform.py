"""Backend/platform configuration helper.

The axon TPU plugin in this environment ignores the JAX_PLATFORMS env var —
only ``jax.config.update`` wins.  Call ``configure_from_env()`` before any
device use; CLIs do this first thing.
"""
from __future__ import annotations

import os


def wants_platform(argv, name: str) -> bool:
    """True iff the LAST ``--platform <x>`` / ``--platform=<x>`` in argv
    names ``name`` — matching argparse's last-occurrence-wins resolution,
    so contradictory argv like ``--platform tpu --platform cpu`` pins the
    same backend argparse will later report.

    Used by tools that must pin the backend BEFORE importing jax (argparse
    hasn't run yet at that point, and it accepts both spellings — the scan
    must too, or an equals-form TPU run silently lands on CPU).  This
    module imports no jax, so it is safe to import pre-initialization.
    """
    last = None
    for i, a in enumerate(argv):
        if a == "--platform" and i + 1 < len(argv):
            last = argv[i + 1]
        elif a.startswith("--platform="):
            last = a.split("=", 1)[1]
    return last == name


def configure_from_env() -> None:
    import jax

    plat = os.environ.get("JAX_PLATFORMS") or os.environ.get("JAX_PLATFORM_NAME")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(
            os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", int(
            os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")))
