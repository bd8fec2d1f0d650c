"""Serving statistics study: running-average vs batch-statistics inference.

The reference's Tester never calls ``.eval()`` (util/tester.py:98-121), so
its SPADE batch norms normalize over the *serving batch* — sample i's
output depends on its batch neighbors, and the program pays cross-batch
reductions at inference.  ``--eval_use_running_stats`` (models/pix2pix.py
generate) opts into proper eval mode.  This study quantifies the choice on
a trained model so the serving default can be promoted on evidence:

1. trains the full config for N steps on the learnable synthetic OpenEDS
   set (so the BN running averages have tracked real activation stats),
2. exports BOTH serving bundles (tools/export_serving.py --stats
   {running,batch}) from the same weights via serving.export_inference,
3. measures artifact latency at bs=1/4/16 for each,
4. tolerance-checks quality: the x1471 relative validation error of both
   modes via the real Tester, plus the direct output delta between modes.

Writes evidence/serving_stats_study.json and prints one JSON line.

Run on the TPU chip:  python tools/serving_stats_study.py
CPU smoke:            python tools/serving_stats_study.py --tiny --steps 5
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.data import schema                      # noqa: E402
from seg2eye_tpu.data.loader import create_dataloader, device_prefetch  # noqa: E402
from seg2eye_tpu.eval.tester import Tester               # noqa: E402
from seg2eye_tpu.models.pix2pix import Pix2Pix           # noqa: E402
from seg2eye_tpu.options import Options                  # noqa: E402
from seg2eye_tpu.serving import export_inference, load_serving  # noqa: E402
from seg2eye_tpu.train import state as state_lib         # noqa: E402
from seg2eye_tpu.train.loop import device_batch          # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions        # noqa: E402


from seg2eye_tpu.utils.timing import device_timeit as timeit  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--workdir", default="runs/serving_stats_study")
    ap.add_argument("--out", default="evidence/serving_stats_study.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config for CPU smoke-testing this tool")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, "data.h5")
    extra = {}
    if args.tiny:
        extra = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
                     input_ns=2, compute_dtype="float32")
        if not os.path.exists(data):
            schema.write_synthetic_h5(data, h=64, w=40, n_ss=8,
                                      learnable=True)
    elif not os.path.exists(data):
        schema.write_synthetic_h5(data, users=("U001", "U002", "U003",
                                               "U004"),
                                  n_ss=24, n_gen=8, n_seq=4, seed=0,
                                  learnable=True)

    opt = Options(batchSize=8 if args.tiny else 16, dataroot=data,
                  name="serving_stats_study",
                  checkpoints_dir=os.path.join(args.workdir, "ckpt"),
                  **({"compute_dtype": "bfloat16"} | extra)).finalize()
    model = Pix2Pix(opt)
    steps = StepFunctions(model)
    state = state_lib.create_state(model, jax.random.PRNGKey(opt.seed))
    dataloader = create_dataloader(opt)

    print(f"[study] training {args.steps} steps to warm the BN running "
          f"averages", file=sys.stderr)
    n, t0 = 0, time.time()
    while n < args.steps:
        for _, db in device_prefetch(dataloader,
                                     lambda b: (b, device_batch(b, None)),
                                     depth=1):
            state, losses, _ = steps.train_step(state, db)
            n += 1
            if n >= args.steps:
                break
    _sync = float(np.mean(np.asarray(losses["GAN"])))
    print(f"[study] trained in {time.time() - t0:.0f}s", file=sys.stderr)
    variables = jax.device_get(state.variables)

    platform = jax.devices()[0].platform
    h, w = opt.image_height, opt.image_width
    rng = np.random.default_rng(0)
    result = {"metric": "serving_stats_study", "platform": platform,
              "train_steps": args.steps, "modes": {}}
    fakes = {}
    for stats in ("running", "batch"):
        sopt = opt.replace(isTrain=False,
                           eval_use_running_stats=stats == "running")
        smodel = Pix2Pix(sopt)
        art_dir = os.path.join(args.workdir, f"artifact_{stats}")
        export_inference(smodel, variables, art_dir,
                         native_hw=(64, 40) if args.tiny else (640, 400),
                         platforms=(platform,))
        served = load_serving(art_dir)
        served_vars = jax.device_put(served.variables)
        rows = []
        for bs in args.batches:
            label = jnp.asarray(
                rng.integers(0, opt.semantic_nc, (bs, h, w)).astype(np.uint8))
            style = jnp.asarray(rng.integers(
                0, 256, (bs, opt.input_ns, h, w, 1)).astype(np.uint8))
            t = timeit(lambda l, s: served._call(served_vars, l, s),
                       (label, style), args.iters)
            rows.append({"bs": bs, "ms": round(t * 1e3, 2),
                         "img_s": round(bs / t, 1)})
            print(f"[study] {stats} bs={bs}: {t * 1e3:.2f} ms",
                  file=sys.stderr)
        # validation quality through the real Tester (x1471 relative error)
        tester = Tester(sopt, dataset_key="validation")
        errs = tester.run(smodel, state.variables, mode="full")
        rel = float(errs["mse/validation/full/relative"])
        result["modes"][stats] = {"latency": rows, "val_rel_error": rel}
        # mode-to-mode output delta on a fixed batch (bs=4)
        label = jnp.asarray(
            rng.integers(0, opt.semantic_nc, (4, h, w)).astype(np.uint8))
        style = jnp.asarray(rng.integers(
            0, 256, (4, opt.input_ns, h, w, 1)).astype(np.uint8))
        fakes[stats] = np.asarray(served._call(served_vars, label, style)[0],
                                  np.float32)

    out_delta = float(np.abs(fakes["running"] - fakes["batch"]).max())
    r, b = (result["modes"]["running"]["val_rel_error"],
            result["modes"]["batch"]["val_rel_error"])
    result["output_max_abs_delta"] = out_delta
    result["val_rel_error_gap"] = abs(r - b)
    result["val_rel_error_gap_pct"] = 100.0 * abs(r - b) / max(b, 1e-9)
    # promotion criterion: running-stats quality within 5% relative of the
    # parity mode on the trained synthetic model
    result["pass"] = bool(result["val_rel_error_gap_pct"] < 5.0)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
