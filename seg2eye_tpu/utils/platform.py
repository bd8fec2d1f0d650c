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


# XLA's TPU space-to-batch converter CHECK-fails while propagating a
# backprop-filter convolution at small batch (space_to_batch_converter.cc:2011
# "Operands to select must be the same shape; got f32[...] and pred[...]"),
# SIGABRTing the compile service: any training compile with a small per-chip
# batch (the 512-geometry regime, or tiny-config probes) dies before running.
# Disabling the pass is measured strictly-better where it would have fired
# (evidence/probe_512.json: bs2@512 +16% img/s, bs4/bs8@512 compile at all
# instead of crashing) and neutral at the bs16 crop-256 headline (c256 guard
# rows, same file).  ``--xla_disable_hlo_passes`` is a generic proto-backed
# DebugOptions flag, so the axon compile helper honors it per-compile even
# though xla_tpu_* tuning flags are unreachable (evidence/xla_flags_probe.json).
SPACE_TO_BATCH_BUG_FLAG = "--xla_disable_hlo_passes=space-to-batch-converter"


def _workaround_space_to_batch_crash() -> None:
    """Append the pass-disable to XLA_FLAGS (opt out: SEG2EYE_SPACE_TO_BATCH=1).

    Must run before XLA first parses XLA_FLAGS (lazily, at first backend
    use) — configure_from_env() is the first thing every CLI calls, so this
    ordering holds wherever it matters.
    """
    if os.environ.get("SEG2EYE_SPACE_TO_BATCH") == "1":
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_disable_hlo_passes" in flags:
        return      # caller manages pass disabling explicitly
    os.environ["XLA_FLAGS"] = (flags + " " + SPACE_TO_BATCH_BUG_FLAG).strip()


def configure_from_env() -> None:
    import jax

    _workaround_space_to_batch_crash()
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
