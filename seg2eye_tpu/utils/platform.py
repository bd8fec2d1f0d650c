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
# BACKPROP-FILTER convolution at small batch (space_to_batch_converter.cc:2011
# "Operands to select must be the same shape; got f32[...] and pred[...]"),
# SIGABRTing the compile service: any TRAINING compile with a small per-chip
# batch (the 512-geometry regime, or tiny-config probes) dies before running.
# Disabling the pass for training compiles is measured strictly-better where
# it would have fired (evidence/probe_512.json: bs2@512 +16% img/s, bs4/bs8
# @512 compile at all instead of crashing) and neutral at the bs16 crop-256
# headline (c256 guard rows, same file).  Forward-only (eval/serving)
# programs keep the pass: it is exactly what makes small-batch inference
# fast (disabling it globally measured 2x slower bs=1 RefineNet serving,
# 4.46 -> 8.66 ms — the round-5 global-XLA_FLAGS attempt, reverted).
# ``xla_disable_hlo_passes`` is a generic proto-backed DebugOptions field,
# so the axon compile helper honors per-jit compiler_options even though
# the xla_tpu_* tuning surface is unreachable (evidence/xla_flags_probe.json).
_SPACE_TO_BATCH_DISABLE = {"xla_disable_hlo_passes": "space-to-batch-converter"}


def training_compiler_options() -> dict:
    """Per-jit compiler options for TRAINING step programs (the only ones
    containing backprop-filter convs).  Opt out: SEG2EYE_SPACE_TO_BATCH=1
    re-enables the pass everywhere (e.g. a future fixed libtpu)."""
    if os.environ.get("SEG2EYE_SPACE_TO_BATCH") == "1":
        return {}
    return dict(_SPACE_TO_BATCH_DISABLE)


def training_jit(fun=None, **jit_kwargs):
    """``jax.jit`` for training-step programs: injects the space-to-batch
    workaround compiler options (unless the caller already set some)."""
    import jax

    opts = training_compiler_options()
    if opts and "compiler_options" not in jit_kwargs:
        jit_kwargs["compiler_options"] = opts
    if fun is None:
        return lambda f: jax.jit(f, **jit_kwargs)
    return jax.jit(fun, **jit_kwargs)


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
