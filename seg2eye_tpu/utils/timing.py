"""Honest device timing on the remote-TPU platform.

On the axon remote-TPU tunnel, ``block_until_ready`` resolves before
execution actually finishes, so wall-clock timing must block on a
``device_get`` of a scalar computed FROM the output (bench.py timing
methodology).  This is the shared implementation for the serving/inference
bench tools; ``utils/roofline.py`` keeps its sibling ``timeit`` (same
methodology, all-inexact-leaves sync + MFU plumbing) for the roofline
tools.  ``device_timeit`` casts EVERY leaf regardless of dtype, so it
also syncs correctly on integer-only outputs (e.g. the SegNet serving
artifact's uint8 argmax map) and on multi-output functions whose later
leaves finish after the first — each output's dependency chain is
covered by the summed reduction.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def device_timeit(fn, args, iters: int = 20) -> float:
    """Mean seconds per ``fn(*args)`` call with an honest device sync.

    Blocks on a device_get of a jitted scalar reduction over ALL output
    leaves (works for array outputs and tuple/pytree outputs alike).
    The first call outside the timed loop serves as warmup/compile.
    """
    sync = jax.jit(
        lambda o: sum(jnp.sum(leaf.astype(jnp.float32))
                      for leaf in jax.tree_util.tree_leaves(o)))
    out = fn(*args)
    float(np.asarray(sync(out)))               # warmup / compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(sync(out)))               # one sync after the loop
    return (time.time() - t0) / iters
