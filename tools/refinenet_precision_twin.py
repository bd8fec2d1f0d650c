"""RefineNet-framework mixed-precision convergence twin (SegNet arm).

Trains the SegNet (MyDeepLab) through the REAL ``refinenet.training
.main_loop`` twice on the learnable synthetic OpenEDS set — once at
float32 (exact reference numerics; the reference trainer has no AMP,
refinenet/core/training.py) and once at the production default
``compute_dtype='bfloat16'`` (every conv on the MXU at bf16 rate, params
and BN statistics f32, models/deeplab.py ConvBN) — with identical
seeds/data and periodic validation, and compares the trajectories.

Exists because the bf16 path changes the default numerics of the whole
DeepLab stack: the one-step closeness test
(tests/test_refinenet.py::test_deeplab_bf16_compute_propagates) pins the
forward rounding, this bounds the *compounded* drift of bf16 gradients +
BN-statistic updates over hundreds of SGD steps.

Usage:
  python tools/refinenet_precision_twin.py [--steps 200] [--test_every 50] \
      [--geometry toy|production] [--platform cpu|tpu] \
      [--out evidence/segnet_precision_twin.json]

``--geometry production --platform tpu`` runs the config defaults
(640x400, resnet-101) on the real chip to retire the toy-scale caveat.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# platform must be pinned BEFORE jax initializes (the axon TPU plugin
# ignores JAX_PLATFORMS — utils/platform.py); pre-scan argv for it,
# accepting both "--platform tpu" and "--platform=tpu" (argparse does)
from seg2eye_tpu.utils.platform import wants_platform  # noqa: E402

_TPU = wants_platform(sys.argv, "tpu")
if _TPU:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

if not _TPU:
    jax.config.update("jax_platforms", "cpu")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--test_every", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--geometry", choices=("toy", "production"),
                    default="toy")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                    help="consumed at import time (pre-argparse scan)")
    ap.add_argument("--workdir", default="runs/refinenet_precision_twin")
    ap.add_argument("--out", default="evidence/segnet_precision_twin.json")
    args = ap.parse_args()
    # toy overrides shrink the config; production keeps the defaults
    # (OpenEDS-native 640x400, resnet-101 — refinenet/config.py)
    geom_overrides = (dict(resnet_depth=14, input_width=40, input_height=64)
                      if args.geometry == "toy" else {})

    from seg2eye_tpu.data import schema
    from seg2eye_tpu.data.loader import DataLoader, subsample
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

    def run_arm(tag: str, dtype: str):
        cfg = RefineNetConfig(
            dataroot=data, batch_size=args.batch_size, test_batch_size=8,
            test_num_samples=32, num_epochs=10**6, max_steps=args.steps,
            test_every_n_steps=args.test_every,
            log_every_n_steps=args.test_every,
            tensorboard_images_every_n_steps=0,
            compute_dtype=dtype, prefetch=0,
            output_dir_base=os.path.join(args.workdir, tag),
            **geom_overrides)
        model = SegNetModel(cfg)
        result = main_loop(model, cfg, DataLoader(
            SegNetDataset(cfg, "train"), batch_size=cfg.batch_size,
            shuffle=True, drop_last=True, seed=cfg.seed),
            {"val": DataLoader(subsample(SegNetDataset(cfg, "validation"),
                                         cfg.test_num_samples, cfg.seed),
                               batch_size=cfg.test_batch_size, shuffle=False,
                               drop_last=False)},
            loss_key="ce_loss", model_name="MyDeepLab", momentum=0.9)
        rows = []
        with open(os.path.join(result["output_dir"],
                               "gsheet_rows.jsonl")) as f:
            for line in f:
                rows.append(json.loads(line))
        return rows, result["final"]["val"]

    rows32, final32 = run_arm("f32", "float32")
    rows16, final16 = run_arm("bf16", "bfloat16")

    curve = []
    for r32, r16 in zip(rows32, rows16):
        if "val/accuracy" in r32:
            curve.append({"step": r32["Step"],
                          "f32_acc": r32["val/accuracy"],
                          "bf16_acc": r16["val/accuracy"],
                          "f32_ce": r32.get("val/ce_loss"),
                          "bf16_ce": r16.get("val/ce_loss")})
    acc_gap = abs(final32["accuracy"] - final16["accuracy"])
    ok = bool(acc_gap < 0.02 and final32["accuracy"] > 0.8)
    caveat = ("toy geometry; production is 640x400 resnet-101 — same code "
              "path, not same scale" if args.geometry == "toy" else
              "production geometry (config defaults, 640x400 resnet-101)")
    geom = ({"input_width": 40, "input_height": 64, "resnet_depth": 14}
            if args.geometry == "toy" else
            {"input_width": 400, "input_height": 640, "resnet_depth": 101})
    result = {"metric": "segnet_precision_convergence_twin",
              "steps": args.steps,
              "platform": jax.devices()[0].platform,
              "device_kind": jax.devices()[0].device_kind,
              # scale recorded so evidence readers see exactly what ran
              # (round-2 advisor finding)
              "geometry": {**geom, "backbone": "resnet",
                           "name": args.geometry,
                           "batch_size": args.batch_size,
                           "data": "synthetic-learnable"},
              "scale_caveat": caveat,
              "curve": curve,
              "final_f32": final32, "final_bf16": final16,
              "final_accuracy_gap": acc_gap, "pass": ok}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
