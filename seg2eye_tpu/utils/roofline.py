"""Shared benchmark helpers: device-keyed peak FLOP/s (the MFU
denominator), XLA cost analysis, and honest remote-TPU timing.

Single source for bench.py and tools/bench_* — a hardcoded per-tool peak
silently misreports MFU on any chip other than the one it was written for
(v4: 1.4x high, v6e: ~4.7x high).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak FLOP/s per chip by device kind
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e: 197 bf16 TFLOP/s
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e/Trillium
}


def peak_flops(device=None) -> float:
    """Peak bf16 FLOP/s of ``device`` (default: the first attached device);
    0.0 when the device kind is unknown — callers must print 'n/a', never a
    made-up MFU."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for k, v in PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 0.0


def flops_of(jitted, *args) -> float:
    """XLA's own cost analysis of the compiled program (best-effort)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


_scalarize = None


def scalar_sync(out) -> float:
    """device_get ONE scalar (a jitted tree-sum) — the honest sync on the
    remote-TPU tunnel, where block_until_ready resolves before execution
    finishes and np.asarray of a full tensor times the host transfer."""
    global _scalarize
    if _scalarize is None:
        _scalarize = jax.jit(
            lambda o: sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(o)
                          if hasattr(l, "dtype")
                          and jnp.issubdtype(l.dtype, jnp.inexact)))
    return float(np.asarray(_scalarize(out)))


def timeit(jitted, args, iters: int = 10) -> float:
    """Median-free pipelined timing: chain ``iters`` dispatches, sync once."""
    out = jitted(*args)
    scalar_sync(out)                                  # warmup + sync
    t0 = time.time()
    for _ in range(iters):
        out = jitted(*args)
    scalar_sync(out)
    return (time.time() - t0) / iters


def report(name: str, t: float, fl: float, peak: float,
           width: int = 28) -> None:
    tf = fl / t / 1e12 if t else 0.0
    mfu = f"{tf / (peak / 1e12) * 100:5.1f}%" if peak else "  n/a"
    print(f"{name:>{width}}: {t * 1e3:8.2f} ms  {fl / 1e12:6.2f} TFLOP  "
          f"{tf:6.1f} TF/s  MFU {mfu}")
