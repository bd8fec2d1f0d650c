#!/usr/bin/env python3
"""Chip-side resume probe (round-4 verdict item 5, chip stage).

Bitwise resumed-vs-unbroken trajectory equivalence is asserted on the CPU
mesh (tests/test_e2e.py::test_resume_trajectory_bitwise); this runs the
same save/restore surface ON THE REAL TPU at production geometry: train
N steps, restart the process path (fresh state), --continue_train, assert
the resumed state advances from the checkpointed step with finite losses,
and record evidence/tpu_resume.json.

    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python tools/tpu_resume_probe.py [--steps 4] [--resume_steps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--resume_steps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "evidence",
                                                  "tpu_resume.json"))
    a = ap.parse_args()

    import jax
    import numpy as np

    from seg2eye_tpu.data import schema
    from seg2eye_tpu.options import Options
    from seg2eye_tpu.train.loop import train

    device = jax.devices()[0]
    wd = tempfile.mkdtemp(prefix="tpu_resume_")
    os.chdir(wd)
    # production geometry (the bench-cached program shape): 640x400 native
    # sources, bs16, bf16, k=4 style refs
    # train split samples = n_ss per user: 4 x 8 = 32 -> 2 batches/epoch
    data = schema.write_synthetic_h5(os.path.join(wd, "data.h5"),
                                     users=("U1", "U2", "U3", "U4"),
                                     n_gen=4, n_ss=8, n_seq=2)
    opt = Options(dataroot=data, name="tpu_resume",
                  checkpoints_dir=os.path.join(wd, "ckpt"), batchSize=16,
                  niter=2, niter_decay=0, print_freq=16,
                  save_latest_freq=10**9, display_freq=10**9,
                  full_val_freq=10**9).finalize()
    opt.save()
    r1 = train(opt, max_steps=a.steps)
    step1 = int(r1["state"].step)
    # extend the schedule so the resumed run has batches left even when the
    # first phase finished its epochs
    r2 = train(opt.replace(continue_train=True, niter=opt.niter + 2),
               max_steps=a.resume_steps)
    step2 = int(r2["state"].step)

    ok = (r1["steps"] == a.steps and r2["steps"] == a.resume_steps
          and step1 == a.steps and step2 == a.steps + a.resume_steps
          and all(np.isfinite(v) for v in r1["losses"].values())
          and all(np.isfinite(v) for v in r2["losses"].values()))
    result = {
        "metric": "tpu_resume_probe", "ok": bool(ok),
        "device": str(device.device_kind),
        "platform": device.platform,
        "steps_before": r1["steps"], "steps_after_resume": r2["steps"],
        "optimizer_step_before": step1, "optimizer_step_after": step2,
        "losses_after_resume": {k: round(float(v), 5)
                                for k, v in r2["losses"].items()},
    }
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
