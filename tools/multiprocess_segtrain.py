#!/usr/bin/env python3
"""Multi-process DP proof for the generic segmentation trainer (R13).

The segtrain loaders shard each global batch per process
(segtrain/datasets.py make_data_loader -> data/loader.py:64-72), and
``device_batch`` assembles the shards with
``jax.make_array_from_process_local_data`` — a branch no single-process
test can reach.  This launches TWO OS processes (jax.distributed, localhost
coordinator, 4 virtual CPU devices each -> one global 8-device mesh with
gloo collectives), runs the REAL ``SegTrainer.training`` + ``validation``
on a shared learnable VOC fixture, and compares against a single-process
run on the same 8-device topology consuming the identical global batches:

  (a) per-step CE losses match across arms,
  (b) the 2-process run is reproducible (rerun gives the same trajectory),
  (c) final val mIoU matches.

Determinism: the train dataset's stochastic augmentation chain is swapped
for the deterministic val chain inside the study (the loader consumes
per-sample RNG in index order, which would diverge between whole-batch and
process-sharded loading — the study isolates sharded loading + assembly +
GSPMD math, not augmentation streams; tools/multiprocess_dp.py makes the
same trade via serial_batches/no_flip).

Usage:
  python tools/multiprocess_segtrain.py \
      [--epochs 2] [--out evidence/multiprocess_segtrain.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pick_port() -> int:
    """A free TCP port for the jax.distributed coordinator.  A fixed
    default collides with stale workers from an interrupted earlier run
    (observed as both workers dying with rc=1); the launcher picks a fresh
    one per invocation and hands it to workers via SEG2EYE_MPSEG_PORT."""
    if "SEG2EYE_MPSEG_PORT" in os.environ:
        return int(os.environ["SEG2EYE_MPSEG_PORT"])
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


PORT = _pick_port()
os.environ["SEG2EYE_MPSEG_PORT"] = str(PORT)          # inherited by spawned workers


def run_arm(pid: int, nprocs: int, dataroot: str, out_path: str,
            epochs: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nprocs}")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, "tests", ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.1")
    sys.path.insert(0, REPO)
    from seg2eye_tpu.utils.platform import configure_from_env
    configure_from_env()
    import jax
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{PORT}",
            num_processes=nprocs, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()

    if nprocs > 1:
        # warm the gloo clique while processes are in lockstep (its connect
        # timeout is shorter than single-core compile skew later)
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import jax.numpy as jnp
        m = Mesh(np.asarray(jax.devices()), ("d",))
        g = jax.make_array_from_process_local_data(
            NamedSharding(m, P("d")),
            np.arange(8 // nprocs, dtype=np.float32))
        jax.block_until_ready(jax.jit(lambda x: jnp.sum(x) + 0.0)(g))
        jax._src.distributed.global_state.client.wait_at_barrier(
            "mpseg_warmup", timeout_in_ms=10 * 60 * 1000)

    from seg2eye_tpu.segtrain import transforms as tr
    from seg2eye_tpu.segtrain.trainer import SegTrainer
    workdir = tempfile.mkdtemp(prefix=f"mpseg_{nprocs}p{pid}_")
    cwd = os.getcwd()
    os.chdir(workdir)                        # Saver writes ./run/...
    try:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from segtrain_convergence import A_args
        args = A_args(data_root=dataroot, epochs=epochs, batch_size=8,
                      workers=0)
        trainer = SegTrainer(args)
        # deterministic loading across arms (see module docstring)
        trainer.train_loader.dataset._tr = tr.val_transform(args.crop_size)
        trace = []
        for epoch in range(epochs):
            trainer.training(epoch,
                             step_hook=lambda i, l: trace.append(l))
        miou = trainer.validation(epochs - 1)
        if pid == 0:
            with open(out_path, "w") as f:
                json.dump({"nprocs": nprocs, "trace": trace,
                           "val_miou": miou}, f)
    finally:
        os.chdir(cwd)


def _spawn(args_list):
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)]
                            + args_list, cwd=REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        REPO, "evidence", "multiprocess_segtrain.json"))
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--dataroot", default="")
    ap.add_argument("--trace_out", default="")
    args = ap.parse_args()

    if args.worker:
        run_arm(args.pid, args.nprocs, args.dataroot, args.trace_out,
                args.epochs)
        return 0

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    workdir = tempfile.mkdtemp(prefix="mpseg_")
    dataroot = os.path.join(workdir, "data")
    from segtrain_convergence import make_learnable_voc
    make_learnable_voc(dataroot, n_train=24, n_val=8)

    t1 = os.path.join(workdir, "trace_1proc.json")
    t2 = os.path.join(workdir, "trace_2proc.json")
    t2b = os.path.join(workdir, "trace_2proc_rerun.json")
    base = ["--worker", "--epochs", str(args.epochs),
            "--dataroot", dataroot]
    # single-process arm first: seeds the shared persistent compile cache
    rc = _spawn(base + ["--pid", "0", "--nprocs", "1",
                        "--trace_out", t1]).wait(timeout=1800)
    assert rc == 0, f"single-process arm failed: {rc}"
    for out in (t2, t2b):
        procs = [_spawn(base + ["--pid", str(i), "--nprocs", "2",
                                "--trace_out", out]) for i in range(2)]
        try:
            rcs = [p.wait(timeout=1800) for p in procs]
        finally:
            # one worker dying early leaves its peer blocked in a gloo
            # barrier/collective — never leave orphans behind
            for p in procs:
                if p.poll() is None:
                    p.kill()
        assert rcs == [0, 0], f"2-process arm failed: {rcs}"

    one = json.load(open(t1))
    two = json.load(open(t2))
    two_b = json.load(open(t2b))
    steps = len(one["trace"])
    assert steps == len(two["trace"]) == len(two_b["trace"]) > 0

    # Assertion structure mirrors tools/multiprocess_dp.py:
    # (a) step 1 matches at float-accumulation scale — same global batch,
    #     same initial state, same math, only gloo-vs-in-process reduction
    #     ordering differs;
    # (b) the 2-process run is bitwise reproducible, so later-step drift vs
    #     the 1-process arm is reduction ordering compounding, not
    #     nondeterminism;
    # (c) the end-state quality (val mIoU on the shared split) agrees.
    step1 = abs(one["trace"][0] - two["trace"][0])
    rerun_diff = max(abs(a - b)
                     for a, b in zip(two["trace"], two_b["trace"]))
    miou_diff = abs(one["val_miou"] - two["val_miou"])
    ok = step1 < 1e-6 and rerun_diff < 1e-7 and miou_diff < 1e-3
    result = {
        "metric": "multiprocess_segtrain_equivalence",
        "steps": steps,
        "loss_trace_1proc": one["trace"],
        "loss_trace_2proc": two["trace"],
        "step1_abs_diff": step1,
        "rerun_abs_diff": rerun_diff,
        "val_miou_1proc": one["val_miou"],
        "val_miou_2proc": two["val_miou"],
        "val_miou_diff": miou_diff,
        "pass": bool(ok),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
