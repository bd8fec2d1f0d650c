"""Seg2Eye (pix2pix) mixed-precision convergence twin — VGG loss path.

Round-2 advisor finding (models/pix2pix.py:305): casting the VGG
perceptual-loss input to the model's compute dtype changes the GAN's loss
numerics under the production bfloat16 default, and only the SegNet arm had
a bf16-vs-f32 twin.  This runs the REAL fused G+D training step twice on
the learnable synthetic OpenEDS set — once at float32 and once at
``compute_dtype='bfloat16'`` — with ``--no_vgg_loss=False`` so the
perceptual path (VGG19 forward in compute dtype, L1 accumulated f32,
models/vgg.py) is part of the optimized objective, and compares the
validation relative-error trajectories.

Both arms share bit-identical f32 parameters (params are always f32; only
compute differs) including the frozen VGG features, which are seed-matched
random here: no torchvision zoo is reachable (PARITY.md "Pretrained
backbones"), and for a numerics twin the question is drift of the same
program under bf16, not perceptual quality — random features exercise the
identical cast/fusion path.

Geometries (recorded in the JSON):
  --geometry toy          64x40 fixture, ngf=4 — CPU-friendly smoke scale
  --geometry production   OpenEDS-native 640x400 fixture, full default
                          config (ngf=ndf=64, crop 256 / aspect 0.8 ->
                          320x256, w_dim=16, k=4 style refs, bs=16) — run
                          with --platform tpu to retire the toy-scale
                          caveat on the real chip.

Usage:
  python tools/pix2pix_precision_twin.py [--steps 150] [--eval_every 50] \
      [--geometry toy|production] [--platform cpu|tpu] \
      [--out evidence/pix2pix_precision_twin.json]
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
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, "tests", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

if not _TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from seg2eye_tpu.data import schema                      # noqa: E402
from seg2eye_tpu.data.loader import create_dataloader    # noqa: E402
from seg2eye_tpu.eval.tester import Tester               # noqa: E402
from seg2eye_tpu.models.pix2pix import Pix2Pix           # noqa: E402
from seg2eye_tpu.options import Options                  # noqa: E402
from seg2eye_tpu.train import state as state_lib         # noqa: E402
from seg2eye_tpu.train.loop import device_batch          # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions        # noqa: E402

GEOMS = {
    # CPU-friendly smoke scale
    "toy": dict(h=64, w=40, ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0,
                w_dim=8, input_ns=2, batch_size=8),
    # the full default config on the OpenEDS-native fixture — the program
    # bench.py/convergence_study.py measure (320x256 crop, 92M-param G)
    "production": dict(h=640, w=400, ngf=64, ndf=64, crop_size=256,
                       aspect_ratio=0.8, w_dim=16, input_ns=4,
                       batch_size=16),
}
GEOM = GEOMS["toy"]


def run_arm(data: str, dtype: str, n_steps: int, eval_every: int):
    opt = Options(batchSize=GEOM["batch_size"], dataroot=data,
                  name=f"pix2pix_twin_{dtype}",
                  checkpoints_dir="runs/pix2pix_precision_twin/ckpt",
                  ngf=GEOM["ngf"], ndf=GEOM["ndf"],
                  crop_size=GEOM["crop_size"],
                  aspect_ratio=GEOM["aspect_ratio"],
                  w_dim=GEOM["w_dim"], input_ns=GEOM["input_ns"],
                  no_vgg_loss=False,          # the path under test
                  compute_dtype=dtype).finalize()
    model = Pix2Pix(opt)
    steps = StepFunctions(model)
    # seed-matched init: identical f32 params (incl. frozen VGG) both arms
    state = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    dataloader = create_dataloader(opt)
    tester = Tester(opt, dataset_key="validation")

    curve = []

    def evaluate(step_n, losses):
        errs = tester.run(model, state.variables, mode="full")
        rec = {"step": step_n,
               "val_rel_error": float(errs["mse/validation/full/relative"]),
               "vgg_raw": float(np.mean(np.asarray(losses["VGG/raw"])))
               if losses else None}
        curve.append(rec)
        print(f"[{dtype}]", json.dumps(rec))

    n, losses = 0, None
    evaluate(0, None)
    while n < n_steps:
        for batch in dataloader:
            state, losses, _ = steps.train_step(state,
                                                device_batch(batch, None))
            n += 1
            if n % eval_every == 0:
                evaluate(n, losses)
            if n >= n_steps:
                break
    if n % eval_every:
        evaluate(n, losses)
    return curve


def main() -> int:
    global GEOM
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--eval_every", type=int, default=50)
    ap.add_argument("--geometry", choices=sorted(GEOMS), default="toy")
    ap.add_argument("--bs", type=int, default=0,
                    help="override the geometry's batch size (e.g. 8 for "
                         "the production f32 arm, which OOMs one v5e chip "
                         "at bs=16 — f32 activations are 2x bf16's)")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                    help="consumed at import time (pre-argparse scan)")
    ap.add_argument("--workdir", default="runs/pix2pix_precision_twin")
    ap.add_argument("--out", default="evidence/pix2pix_precision_twin.json")
    args = ap.parse_args()
    GEOM = dict(GEOMS[args.geometry])
    if args.bs:
        GEOM["batch_size"] = args.bs

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, f"data_{args.geometry}.h5")
    if not os.path.exists(data):
        if args.geometry == "production":
            # match convergence_study.ensure_fixture's native-res fixture
            schema.write_synthetic_h5(
                data, users=("U001", "U002", "U003", "U004"),
                n_ss=24, n_gen=8, n_seq=4, learnable=True)
        else:
            schema.write_synthetic_h5(data, h=GEOM["h"], w=GEOM["w"],
                                      n_ss=8, learnable=True)

    c32 = run_arm(data, "float32", args.steps, args.eval_every)
    c16 = run_arm(data, "bfloat16", args.steps, args.eval_every)

    # pass = both arms actually learn (tail < initial) and the bf16 arm's
    # TAIL-MEAN (last <=3 eval points — single GAN eval points are noisy,
    # cf. the convergence-study curves in BASELINE.md) lands within 20%
    # relative of the f32 arm's.  Bounds divergence, does not claim
    # bitwise trajectories.
    k = min(3, len(c32) - 1) or 1
    f32 = float(np.mean([r["val_rel_error"] for r in c32[-k:]]))
    bf16 = float(np.mean([r["val_rel_error"] for r in c16[-k:]]))
    rel_gap = abs(f32 - bf16) / max(f32, 1e-9)
    ok = bool(bf16 < c16[0]["val_rel_error"] and f32 < c32[0]["val_rel_error"]
              and rel_gap < 0.20)
    caveat = ("toy geometry; production is 320x256 ngf=64 — same code "
              "path, not same scale" if args.geometry == "toy" else
              "production geometry (full default config)")
    result = {"metric": "pix2pix_vgg_precision_convergence_twin",
              "steps": args.steps,
              "platform": jax.devices()[0].platform,
              "device_kind": jax.devices()[0].device_kind,
              "geometry": {**GEOM, "name": args.geometry,
                           "data": "synthetic-learnable",
                           "vgg_weights": "seed-matched random (no zoo)"},
              "scale_caveat": caveat,
              "curve_f32": c32, "curve_bf16": c16,
              "tail_mean_f32": f32, "tail_mean_bf16": bf16,
              "tail_points": k,
              "tail_rel_gap": rel_gap, "pass": ok}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if not k.startswith("curve")}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
