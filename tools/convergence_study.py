"""Convergence-trajectory study on the learnable synthetic OpenEDS set.

Trains the full 92M-param Seg2Eye config on one chip against the
deterministic mask->image rendering fixture (data/schema.py:_render) and
logs the validation relative error (the OpenEDS challenge x1471 metric,
reference models/networks/loss.py:158-174) at a fixed cadence — so the
artifact is a convergence *curve*, not a spot check.

Run once at exact reference step semantics and once with --reuse_fake to
measure the quality impact of the opt-in fast path (PARITY.md "Documented
deviations"):

    python tools/convergence_study.py --steps 1500 --eval_every 150 \
        --out runs/convergence_baseline.jsonl
    python tools/convergence_study.py --steps 1500 --eval_every 150 \
        --reuse_fake --out runs/convergence_reuse_fake.jsonl

One JSONL line per eval point:
  {"step": N, "val_rel_error": X, "losses": {...}, "elapsed_s": T}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.data import schema                      # noqa: E402
from seg2eye_tpu.data.loader import create_dataloader, device_prefetch  # noqa: E402
from seg2eye_tpu.eval.tester import Tester               # noqa: E402
from seg2eye_tpu.models.pix2pix import Pix2Pix           # noqa: E402
from seg2eye_tpu.options import Options                  # noqa: E402
from seg2eye_tpu.train import state as state_lib         # noqa: E402
from seg2eye_tpu.train.loop import device_batch          # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions        # noqa: E402


def ensure_fixture(path: str, seed: int = 0) -> str:
    """Learnable fixture at OpenEDS-native 640x400: 4 users x 24 labeled
    samples per split (96 train / 96 validation samples)."""
    if not os.path.exists(path):
        schema.write_synthetic_h5(
            path, users=("U001", "U002", "U003", "U004"),
            n_ss=24, n_gen=8, n_seq=4, seed=seed, learnable=True)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_every", type=int, default=150)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--reuse_fake", action="store_true")
    ap.add_argument("--data", default="runs/convergence_data.h5")
    ap.add_argument("--out", default="runs/convergence.jsonl")
    ap.add_argument("--name", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config for CPU smoke-testing this tool")
    ap.add_argument("--device_normalize", action="store_true",
                    help="run with the production uint8 transport instead "
                         "of the pinned f32 baseline transport")
    ap.add_argument("--data_mesh", type=int, default=0,
                    help="run the SAME study data-parallel over an N-device "
                         "mesh (virtual CPU devices in tests) — the "
                         "multi-step DP convergence twin of the single-"
                         "device arm")
    args = ap.parse_args()

    name = args.name or ("conv_reuse" if args.reuse_fake else "conv_base")
    extra = {}
    if args.tiny:
        extra = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                     input_ns=2, compute_dtype="float32")
        args.data = args.data.replace(".h5", "_tiny.h5")
        if not os.path.exists(args.data):
            schema.write_synthetic_h5(args.data, h=64, w=40, n_ss=8,
                                      learnable=True)
    else:
        ensure_fixture(args.data)
    # device_normalize pinned OFF by default: the r2 baseline curve ran f32
    # transport, so the reuse_fake comparison must differ ONLY in reuse_fake
    opt = Options(batchSize=args.bs, dataroot=args.data, name=name,
                  checkpoints_dir="runs/checkpoints",
                  device_normalize=args.device_normalize,
                  reuse_fake=args.reuse_fake,
                  **({"compute_dtype": "bfloat16"} | extra)).finalize()

    model = Pix2Pix(opt)
    steps = StepFunctions(model)
    state = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    mesh = None
    if args.data_mesh:
        from seg2eye_tpu.parallel.sharding import (make_mesh, param_shardings,
                                                   place_state)
        mesh = make_mesh(opt, data=args.data_mesh, model=1)
        state = place_state(state, param_shardings(state, mesh))
    dataloader = create_dataloader(opt)
    tester = Tester(opt, dataset_key="validation")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out = open(args.out, "w")

    def evaluate(step_n: int, losses, elapsed: float) -> float:
        errs = tester.run(model, state.variables, mode="full")
        rel = float(errs["mse/validation/full/relative"])
        rec = {"step": step_n, "val_rel_error": rel,
               "losses": {k: float(np.mean(np.asarray(v)))
                          for k, v in (losses or {}).items()},
               "reuse_fake": bool(args.reuse_fake),
               "data_mesh": args.data_mesh,
               "elapsed_s": round(elapsed, 1)}
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print("[curve]", json.dumps(rec))
        return rel

    t0 = time.time()
    n = 0
    losses = None
    evaluate(0, None, 0.0)
    while n < args.steps:
        prefetched = device_prefetch(
            dataloader, lambda b: (b, device_batch(b, mesh)), depth=1)
        for _, db in prefetched:
            state, losses, _ = steps.train_step(state, db)
            n += 1
            if n % args.eval_every == 0:
                evaluate(n, losses, time.time() - t0)
            if n >= args.steps:
                break
    if n % args.eval_every:
        evaluate(n, losses, time.time() - t0)
    out.close()


if __name__ == "__main__":
    main()
