"""Real multi-process data parallelism proof (round-2 verdict item 1).

Launches TWO OS processes that each call ``jax.distributed.initialize``
(localhost coordinator, 4 virtual CPU devices per process -> one global
8-device mesh with gloo cross-process collectives), run the REAL
``seg2eye_tpu.train.loop.train`` for a few steps — real process-sharded
loader (data/loader.py), real ``jax.make_array_from_process_local_data``
batch assembly (parallel/sharding.py shard_batch), real fused G+D step —
and record full-precision per-step losses.  A third, single-process run on
the same 8-device mesh consumes the identical global batches; the script
asserts the two loss trajectories match.

This is the CPU twin of a 2-host TPU slice: everything except ICI-vs-gloo
transport is the production code path.  Reference equivalent: DP is the
reference's only sharding dimension (SURVEY §2.4, nn.DataParallel at
models/networks/__init__.py:47).

Usage:
  python tools/multiprocess_dp.py                  # full study, prints PASS
  python tools/multiprocess_dp.py --steps 4 --out evidence/multiprocess_dp.json

Determinism note: batches must be bit-identical across arms, so the study
runs serial_batches + no_flip + style_sample_method=first (no per-sample RNG
consumption differences between process-sharded and whole-batch loading).
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
    one per invocation and hands it to workers via SEG2EYE_MPDP_PORT."""
    if "SEG2EYE_MPDP_PORT" in os.environ:
        return int(os.environ["SEG2EYE_MPDP_PORT"])
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


PORT = _pick_port()
os.environ["SEG2EYE_MPDP_PORT"] = str(PORT)          # inherited by spawned workers


def _opt(dataroot: str, ckpt_dir: str, name: str, steps: int):
    from seg2eye_tpu.options import Options
    return Options(
        name=name, dataroot=dataroot, checkpoints_dir=ckpt_dir,
        ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8, input_ns=2,
        compute_dtype="float32", batchSize=8, niter=50, niter_decay=0,
        serial_batches=True, no_flip=True, style_sample_method="first",
        print_freq=10**6, display_freq=10**6, save_latest_freq=10**6,
        full_val_freq=10**6, save_epoch_freq=10**6, max_steps=steps,
        prefetch=0, isTrain=True)


def run_arm(pid: int, nprocs: int, dataroot: str, out_path: str,
            steps: int) -> None:
    """One training process (worker mode).  With nprocs == 1 this is the
    single-process comparison arm on the same 8-device topology."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nprocs}")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, "tests", ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
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
        # establish the gloo context for the full 8-device clique NOW, while
        # the processes are still in lockstep — its connect timeout (30s) is
        # shorter than single-core compile skew later in the run
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        m = Mesh(np.asarray(jax.devices()), ("d",))
        g = jax.make_array_from_process_local_data(
            NamedSharding(m, P("d")),
            np.arange(8 // nprocs, dtype=np.float32))
        import jax.numpy as jnp
        jax.block_until_ready(jax.jit(lambda x: jnp.sum(x) + 0.0)(g))
        # barrier via the coordination service (long timeout): both enter
        # the training run together
        jax._src.distributed.global_state.client.wait_at_barrier(
            "mpdp_warmup", timeout_in_ms=10 * 60 * 1000)

    from seg2eye_tpu.train.loop import train
    tmp = tempfile.mkdtemp(prefix=f"mpdp_{nprocs}p{pid}_")
    opt = _opt(dataroot, tmp, f"proc{pid}", steps)
    trace = []

    def hook(step, losses):
        trace.append({k: float(v) for k, v in sorted(losses.items())})

    train(opt, step_hook=hook)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"nprocs": nprocs, "trace": trace}, f)


def _spawn(args_list):
    return subprocess.Popen([sys.executable, os.path.abspath(__file__)]
                            + args_list, cwd=REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(REPO, "evidence",
                                                  "multiprocess_dp.json"))
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--dataroot", default="")
    ap.add_argument("--trace_out", default="")
    args = ap.parse_args()

    if args.worker:
        run_arm(args.pid, args.nprocs, args.dataroot, args.trace_out,
                args.steps)
        return 0

    sys.path.insert(0, REPO)
    workdir = tempfile.mkdtemp(prefix="mpdp_")
    dataroot = os.path.join(workdir, "openeds.h5")
    from seg2eye_tpu.data.schema import write_synthetic_h5
    write_synthetic_h5(dataroot, n_ss=16, h=32, w=32, learnable=True)

    t2 = os.path.join(workdir, "trace_2proc.json")
    t1 = os.path.join(workdir, "trace_1proc.json")
    base = ["--worker", "--steps", str(args.steps), "--dataroot", dataroot]
    # single-process arm FIRST: it seeds the shared persistent compile cache
    # (same global 8-device topology), so the 2-process arm compiles in
    # seconds per process and stays within gloo's connect timeout
    rc = _spawn(base + ["--pid", "0", "--nprocs", "1",
                        "--trace_out", t1]).wait(timeout=1200)
    assert rc == 0, f"single-process arm failed: {rc}"
    t2b = os.path.join(workdir, "trace_2proc_rerun.json")
    for out in (t2, t2b):
        procs = [_spawn(base + ["--pid", str(i), "--nprocs", "2",
                                "--trace_out", out]) for i in range(2)]
        try:
            rcs = [p.wait(timeout=1200) for p in procs]
        finally:
            # one worker dying early leaves its peer blocked in a gloo
            # barrier/collective — never leave orphans behind
            # (mirrors tools/multiprocess_segtrain.py)
            for p in procs:
                if p.poll() is None:
                    p.kill()
        assert rcs == [0, 0], f"2-process arm failed: {rcs}"

    with open(t2) as f:
        two = json.load(f)["trace"]
    with open(t2b) as f:
        two_b = json.load(f)["trace"]
    with open(t1) as f:
        one = json.load(f)["trace"]
    assert len(two) == len(two_b) == len(one) == args.steps

    # (a) step 1 must match EXACTLY between 2-process and single-process:
    # same global batch, same initial state, same math — proves the
    # process-sharded loader + make_array_from_process_local_data assembly
    # feed the identical computation.
    step1 = max(abs(two[0][k] - one[0][k]) for k in two[0])
    # (b) the 2-process run must be bitwise REPRODUCIBLE: rerunning the
    # same topology gives the same trajectory, so any drift vs the
    # single-process arm is reduction ordering (gloo ring vs in-process),
    # not nondeterminism.
    rerun = max(abs(a[k] - b[k]) for a, b in zip(two, two_b) for k in a)
    # (c) early-step drift stays within float-accumulation scale; later
    # steps decohere chaotically (GAN dynamics amplify ~1e-7 weight
    # differences), which the DP convergence twin covers statistically.
    # normalized by the loss's magnitude floored at 1.0: the hinge-GAN 'GAN'
    # term sits near 0 by construction, so a raw relative diff there would
    # just measure noise around zero
    step2 = max(abs(two[1][k] - one[1][k]) /
                max(abs(one[1][k]), abs(two[1][k]), 1.0) for k in two[1])
    ok = step1 < 1e-6 and rerun < 1e-7 and step2 < 1e-3
    result = {
        "metric": "multiprocess_dp_equivalence",
        "steps": args.steps,
        "arms": {"2proc_4dev_each": two, "2proc_rerun": two_b,
                 "1proc_8dev": one},
        "step1_abs_diff": step1,
        "rerun_abs_diff": rerun,
        "step2_rel_drift": step2,
        "pass": bool(ok),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("metric", "steps", "step1_abs_diff", "rerun_abs_diff",
                       "step2_rel_drift", "pass")}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
