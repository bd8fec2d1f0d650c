"""Device mesh + sharding rules (the multi-device substrate).

Replaces the reference's single-process nn.DataParallel + threaded SyncBN
(SURVEY §2.4) with the TPU-idiomatic design:

  * a ``Mesh`` with axes ('data', 'model') over ICI;
  * batches sharded on 'data' (each host process loads only its shard);
  * parameters replicated (DP) or — optionally — large conv kernels sharded
    over 'model' on their output-channel dim (tensor parallelism; GSPMD
    inserts the all-gathers/reduce-scatters);
  * gradient averaging and batch-norm statistics need NO explicit collectives:
    under jit, reductions over the sharded batch axis lower to psum over
    'data', which IS synchronized BN + gradient all-reduce.

Everything works identically on a real TPU slice and on the virtual
8-device CPU mesh used in tests (XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(opt=None, data: Optional[int] = None,
              model: Optional[int] = None,
              allow_uneven: bool = False) -> Optional[Mesh]:
    """Build the ('data','model') mesh.  data=0/None -> all devices on data.

    Batch size must divide an *explicitly requested* data axis, matching the
    reference's hard assert on user-specified gpu_ids
    (options/base_options.py:170-172) — a silent shrink there would degrade
    to partial replication at scale.  When the data axis was auto-defaulted
    (data_axis=0 -> all devices), we shrink to the largest divisor with a
    loud warning instead, since the user never asked for that degree.
    ``allow_uneven=True`` forces the shrink path for an explicit axis (tests).
    """
    import math
    devices = jax.devices()
    n = len(devices)
    explicit = data is not None
    if opt is not None:
        if data is None and opt.data_axis:
            data, explicit = opt.data_axis, True
        model = model if model is not None else opt.model_axis
    model = model or 1
    data = data or (n // model)
    if opt is not None and opt.batchSize % data != 0:
        if explicit and not allow_uneven:
            raise ValueError(
                f"batchSize {opt.batchSize} is not divisible by the "
                f"requested data mesh axis ({data}); the reference asserts "
                f"this (base_options.py:170-172).  Pick batchSize as a "
                f"multiple of the data-parallel degree, or pass "
                f"allow_uneven=True to shrink the data axis (tests only).")
        data = math.gcd(opt.batchSize, data)
        print(f"[mesh] WARNING: batchSize {opt.batchSize} not divisible by "
              f"the data axis; degrading to data={data} "
              f"(devices beyond data*model={data * model} stay idle)")
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    devs = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def default_data_mesh(batch_size: int, warn=print) -> Optional[Mesh]:
    """Data-parallel mesh over all attached devices when the global batch
    divides them; None (single-device semantics) otherwise.

    The TPU-native default for the RefineNet/segtrain CLIs: one chip
    degenerates to a mesh-free run, a pod slice gets DP for free.  The
    mesh-free fallback is only legal single-process — under multi-process
    DP the loaders already yield per-process shards (data/loader.py), so
    running without a mesh would silently train one UNSYNCHRONIZED model
    per host on disjoint data; that case is a hard error, not a fallback.
    """
    n = jax.device_count()
    if n <= 1:
        return None
    if batch_size % n:
        if jax.process_count() > 1:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"{n} devices under multi-process DP (process-sharded "
                f"loaders make the mesh-free fallback invalid)")
        warn(f"batch_size {batch_size} not divisible by {n} devices — "
             f"running single-device (pick a divisible batch size for DP)")
        return None
    return make_mesh(None, data=n, model=1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Put each array with its leading (batch) axis sharded over 'data'.

    Single-process: a plain device_put of the full batch.  Multi-process
    (jax.process_count() > 1): each process's loader yields only its LOCAL
    shard of the global batch (data/loader.py), so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — device_put
    of the local shard as if it were the global batch would be wrong."""
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        spec = P("data", *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a whole train-state pytree across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def place_state(state, shardings):
    """Lay out a (host-identical) state pytree per a sharding pytree.

    Single-process: plain ``device_put``.  Multi-process: ``device_put`` onto
    a non-fully-addressable sharding routes through multihost assert_equal —
    a full cross-host parameter allgather (one tiny pjit PER LEAF) just to
    re-verify values every process already holds.  Each process instead
    fills its addressable shards directly with
    ``jax.make_array_from_callback`` (every process computed the same state
    from the same seed, the invariant the train loop maintains anyway)."""
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def place(leaf, sharding):
        v = np.asarray(leaf)
        return jax.make_array_from_callback(
            v.shape, sharding, lambda idx: v[idx])

    return jax.tree_util.tree_map(place, state, shardings)


def shard_batch_spatial(batch: Dict, mesh: Mesh) -> Dict:
    """Context-parallel analogue for conv activations (SURVEY §2.4): shard
    the spatial H axis over 'data' instead of the batch axis.

    For serving at batch sizes below the device count (the latency-bound
    regime — batch sharding would idle devices), every NHWC activation is
    split into H-bands; GSPMD inserts halo exchanges at conv/resize
    boundaries automatically.  Pair with ``spatial_constraint(mesh)`` passed
    as ``constrain=`` to ``Pix2Pix.inference`` — without it GSPMD keeps
    low-resolution activations (H < data axis) on padded uneven shards,
    where partitioned 3x3 convs are numerically WRONG (see PARITY.md
    "spatial sharding"; reproduced at H=2 over 4 devices: the conv output
    differs 100% from the replicated program, far beyond rounding).

    Array rank decides the H axis position: label (B,H,W) -> axis 1,
    images (B,H,W,C) -> axis 1, style stacks (B,k,H,W,C) -> axis 2.
    """
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        h_axis = {3: 1, 4: 1, 5: 2}.get(v.ndim)
        spec = [None] * v.ndim
        if h_axis is not None and v.shape[h_axis] % mesh.shape["data"] == 0:
            spec[h_axis] = "data"
        out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
    return out


def spatial_constraint(mesh: Mesh):
    """Per-resolution activation-sharding policy for spatially-sharded
    (context-parallel) inference: shard H over 'data' while it divides the
    axis, fall back to full replication for the tiny bottleneck resolutions.

    An uneven H-sharding (H not divisible by the data axis) forces GSPMD to
    pad shards, and the partitioned conv then produces wrong borders — a
    measured XLA correctness hazard, not just a rounding change.  The deep
    layers this replicates hold a negligible share of the FLOPs (the conv
    pyramid's cost concentrates at high resolution), so replicating them
    costs ~nothing while the expensive top resolutions keep the latency win.

    Returns a callable ``f(x) -> x`` for NHWC activations, to pass as
    ``constrain=`` into the generator / encoder / ``Pix2Pix.inference``.
    """
    nd = mesh.shape["data"]

    def f(x: jax.Array) -> jax.Array:
        if x.ndim >= 3 and x.shape[1] % nd == 0:
            spec = P(None, "data", *([None] * (x.ndim - 2)))
        else:
            spec = P()
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return f


def param_shardings(variables, mesh: Mesh, min_channels: int = 256):
    """Optional tensor-parallel layout: shard conv kernels' output-channel
    dim over 'model' when it is both large and divisible; everything else
    replicated.  With model axis size 1 this is pure replication."""
    model_n = mesh.shape["model"]

    def rule(path, leaf):
        if model_n > 1 and hasattr(leaf, "ndim") and leaf.ndim == 4:
            out_ch = leaf.shape[-1]
            if out_ch >= min_channels and out_ch % model_n == 0:
                return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)
