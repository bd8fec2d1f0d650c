"""RefineNet-framework DP convergence twin (SegNet arm).

Trains the SegNet (MyDeepLab) through the REAL ``refinenet.training
.main_loop`` twice on the learnable synthetic OpenEDS set — single-device
vs data-parallel over an 8-virtual-device CPU mesh — with identical
seeds/data, periodic validation every ``--test_every`` steps, and compares
the accuracy/CE trajectories.  This is the RefineNet-side counterpart of
``tools/convergence_study.py --data_mesh 8`` (Seg2Eye) and of the 1-step DP
equality test (tests/test_refinenet.py::test_dp_step_matches_single_device):
the 1-step test pins the math, this bounds the compounding drift of
BN-statistic updates under GSPMD-psum SyncBN over hundreds of SGD steps.

Reference equivalent: none — the reference RefineNet trainer is single-GPU
(refinenet/core/training.py; SyncBatchNorm exists only in the vendored
DeepLab modeling, never multi-device from any OpenEDS entry point).

Usage:
  python tools/refinenet_dp_twin.py [--steps 200] [--test_every 50] \
      [--out evidence/segnet_dp_twin.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--test_every", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--workdir", default="runs/refinenet_dp_twin")
    ap.add_argument("--out", default="evidence/segnet_dp_twin.json")
    args = ap.parse_args()

    from seg2eye_tpu.data import schema
    from seg2eye_tpu.data.loader import DataLoader, subsample
    from seg2eye_tpu.parallel.sharding import make_mesh
    from seg2eye_tpu.refinenet.config import RefineNetConfig
    from seg2eye_tpu.refinenet.model import SegNetModel
    from seg2eye_tpu.refinenet.segnet_dataset import SegNetDataset
    from seg2eye_tpu.refinenet.training import main_loop

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, "data.h5")
    if not os.path.exists(data):
        schema.write_synthetic_h5(data,
                                  users=("U001", "U002", "U003", "U004"),
                                  n_ss=24, n_gen=8, n_seq=4, seed=0,
                                  learnable=True)

    def run_arm(tag: str, mesh):
        cfg = RefineNetConfig(
            dataroot=data, batch_size=args.batch_size, test_batch_size=8,
            test_num_samples=32, num_epochs=10**6, max_steps=args.steps,
            test_every_n_steps=args.test_every,
            log_every_n_steps=args.test_every,
            tensorboard_images_every_n_steps=0,
            compute_dtype="float32", resnet_depth=14,
            input_width=40, input_height=64, prefetch=0,
            output_dir_base=os.path.join(args.workdir, tag))
        model = SegNetModel(cfg)
        result = main_loop(model, cfg, DataLoader(
            SegNetDataset(cfg, "train"), batch_size=cfg.batch_size,
            shuffle=True, drop_last=True, seed=cfg.seed),
            {"val": DataLoader(subsample(SegNetDataset(cfg, "validation"),
                                         cfg.test_num_samples, cfg.seed),
                               batch_size=cfg.test_batch_size, shuffle=False,
                               drop_last=False)},
            loss_key="ce_loss", model_name="MyDeepLab", momentum=0.9,
            mesh=mesh)
        rows = []
        with open(os.path.join(result["output_dir"],
                               "gsheet_rows.jsonl")) as f:
            for line in f:
                rows.append(json.loads(line))
        return rows, result["final"]["val"]

    rows1, final1 = run_arm("dp1", None)
    mesh = make_mesh(None, data=8, model=1)
    rows8, final8 = run_arm("dp8", mesh)

    curve = []
    for r1, r8 in zip(rows1, rows8):
        if "val/accuracy" in r1:
            curve.append({"step": r1["Step"],
                          "dp1_acc": r1["val/accuracy"],
                          "dp8_acc": r8["val/accuracy"],
                          "dp1_ce": r1.get("val/ce_loss"),
                          "dp8_ce": r8.get("val/ce_loss")})
    acc_gap = abs(final1["accuracy"] - final8["accuracy"])
    ok = bool(acc_gap < 0.02 and final1["accuracy"] > 0.8)
    result = {"metric": "segnet_dp_convergence_twin", "steps": args.steps,
              "curve": curve,
              "final_dp1": final1, "final_dp8": final8,
              "final_accuracy_gap": acc_gap, "pass": ok}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
