"""RefineNet-system serving-artifact benchmark: exported bundle vs live.

Same methodology as tools/bench_serving_artifact.py, for the challenge-
winning path's two task models (serving.export_refiner): export the
production-geometry model (DeepLab resnet-101, 640x400, bf16) as the
batch-polymorphic AOT artifact, reload it WITHOUT model code, and time it
against the live-jit eval on the attached chip.  The reference's only
inference story here is re-running evaluate_{refinenet,segnet}.py inside
the training repo.

Usage: python tools/bench_refinenet_serving.py [--model refinenet|segnet]
                                               [--batches 1 8]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from seg2eye_tpu.refinenet.config import RefineNetConfig  # noqa: E402
from seg2eye_tpu.refinenet.model import (RefineNetModel,  # noqa: E402
                                         SegNetModel)
from seg2eye_tpu.serving import export_refiner, load_serving  # noqa: E402


from seg2eye_tpu.utils.timing import device_timeit as timeit  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("refinenet", "segnet"),
                    default="refinenet")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry for CPU smoke tests")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    kw = dict(resnet_depth=14, input_width=40, input_height=64,
              compute_dtype="float32") if args.tiny else {}
    cfg = RefineNetConfig(**kw)
    if args.model == "refinenet":
        model, in_ch = RefineNetModel(cfg), 3
    else:
        model, in_ch = SegNetModel(cfg), 1
    variables = model.init(jax.random.PRNGKey(0))
    h, w = cfg.input_height, cfg.input_width

    out_dir = tempfile.mkdtemp(prefix=f"serving_{args.model}_")
    export_refiner(model, jax.device_get(variables), out_dir,
                   platforms=(platform,))
    size_mb = sum(os.path.getsize(os.path.join(out_dir, f))
                  for f in os.listdir(out_dir)) / 1e6
    print(f"artifact: {out_dir} ({size_mb:.1f} MB, platform={platform})",
          file=sys.stderr)

    served = load_serving(out_dir)
    served_vars = jax.device_put(served.variables)

    def artifact_fn(x):
        out = served._call(served_vars, x)
        return out if isinstance(out, tuple) else (out,)

    live = jax.jit(lambda v, x: (
        model.forward(v, {"input": x}, train=False)[0]["prediction"],))

    rng = np.random.default_rng(0)
    rows = []
    for bs in args.batches:
        x = jnp.asarray(rng.integers(0, 256, (bs, h, w, in_ch)
                                     ).astype(np.uint8))
        t_art = timeit(artifact_fn, (x,), args.iters)
        t_live = timeit(live, (variables, x), args.iters)
        art = np.asarray(artifact_fn(x)[0], np.float32)
        liv = np.asarray(live(variables, x)[0], np.float32)
        row = {"bs": bs,
               "artifact_ms": round(t_art * 1e3, 2),
               "live_ms": round(t_live * 1e3, 2),
               "artifact_img_s": round(bs / t_art, 1),
               "max_abs_diff": float(np.abs(art - liv).max())}
        rows.append(row)
        print(row, file=sys.stderr)
    print(json.dumps({"model": args.model, "platform": platform,
                      "geometry": [h, w], "backbone": cfg.backbone,
                      "resnet_depth": cfg.resnet_depth,
                      "artifact_mb": round(size_mb, 1), "rows": rows}))


if __name__ == "__main__":
    main()
