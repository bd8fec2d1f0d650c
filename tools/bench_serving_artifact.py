"""AOT serving-artifact benchmark: the exported bundle vs the live model.

Exports the full-size inference pipeline (seg2eye_tpu/serving/export.py —
batch-polymorphic StableHLO + weights, the production deployment format),
reloads it WITHOUT the model code, and times it against the live-jit path
on the attached chip across batch sizes.  The reference has no serving
story beyond re-running test.py inside the training repo (test.py:1-60);
this demonstrates the artifact serves at live-path speed with no Python
tracing at startup.

Usage: python tools/bench_serving_artifact.py [--batches 1 16]
                                              [--out_dir DIR]
Prints one JSON line:
  [{"bs": 1, "artifact_ms": ..., "live_ms": ..., "max_abs_diff": ...}, ...]
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

from seg2eye_tpu.models.pix2pix import Pix2Pix  # noqa: E402
from seg2eye_tpu.options import Options  # noqa: E402
from seg2eye_tpu.serving import export_inference, load_serving  # noqa: E402


from seg2eye_tpu.utils.timing import device_timeit as timeit  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--out_dir", default=None,
                    help="artifact directory (default: a temp dir)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config for CPU smoke tests")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    kw = dict(ngf=4, ndf=4, crop_size=32, aspect_ratio=1.0, w_dim=8,
              input_ns=2, compute_dtype="float32") if args.tiny else \
         dict(compute_dtype="bfloat16")
    opt = Options(batchSize=max(args.batches), **kw).finalize()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    h, w = opt.image_height, opt.image_width

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="serving_artifact_")
    export_inference(model, jax.device_get(variables), out_dir,
                     platforms=(platform,))
    size_mb = sum(os.path.getsize(os.path.join(out_dir, f))
                  for f in os.listdir(out_dir)) / 1e6
    print(f"artifact: {out_dir} ({size_mb:.1f} MB, platform={platform})",
          file=sys.stderr)

    served = load_serving(out_dir)
    served_vars = jax.device_put(served.variables)

    def artifact_fn(label, style):
        return served._call(served_vars, label, style)

    live = jax.jit(lambda v, label, style: (
        model.inference(v, {"label": label, "style_image": style}),))

    rng = np.random.default_rng(0)
    rows = []
    for bs in args.batches:
        label = jnp.asarray(rng.integers(0, 4, (bs, h, w)).astype(np.uint8))
        style = jnp.asarray(rng.integers(
            0, 256, (bs, opt.input_ns, h, w, 1)).astype(np.uint8))
        t_art = timeit(artifact_fn, (label, style), args.iters)
        t_live = timeit(live, (variables, label, style), args.iters)
        fake_art = np.asarray(artifact_fn(label, style)[0], np.float32)
        fake_live = np.asarray(live(variables, label, style)[0], np.float32)
        row = {"bs": bs,
               "artifact_ms": round(t_art * 1e3, 2),
               "live_ms": round(t_live * 1e3, 2),
               "artifact_img_s": round(bs / t_art, 1),
               "max_abs_diff": float(np.abs(fake_art - fake_live).max())}
        rows.append(row)
        print(row, file=sys.stderr)
    print(json.dumps({"platform": platform, "artifact_mb": round(size_mb, 1),
                      "rows": rows}))


if __name__ == "__main__":
    main()
