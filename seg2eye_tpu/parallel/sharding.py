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
              model: Optional[int] = None) -> Optional[Mesh]:
    """Build the ('data','model') mesh.  data=0/None -> all devices on data."""
    import math
    devices = jax.devices()
    n = len(devices)
    if opt is not None:
        data = data if data is not None else (opt.data_axis or 0)
        model = model if model is not None else opt.model_axis
    model = model or 1
    data = data or (n // model)
    if opt is not None and opt.batchSize % data != 0:
        # reference asserts batch divisibility (base_options.py:170-172);
        # we degrade to the largest divisor instead of crashing
        data = math.gcd(opt.batchSize, data)
        print(f"[mesh] batchSize {opt.batchSize} not divisible by data axis; "
              f"using data={data}")
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    devs = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


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
