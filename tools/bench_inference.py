"""Serving-path benchmark: jitted inference (k-style encode + generate) and
the full in-graph eval program (inference -> 640x400 bilinear resize ->
truncating [0,255]) on one chip, across batch sizes.

Usage: python tools/bench_inference.py [--batches 4 16 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

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
from seg2eye_tpu.ops import image as image_ops  # noqa: E402
from seg2eye_tpu.options import Options  # noqa: E402


from seg2eye_tpu.utils.timing import device_timeit as timeit  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[4, 16, 32])
    args = ap.parse_args()

    opt = Options(batchSize=max(args.batches),
                  compute_dtype="bfloat16").finalize()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    h, w = opt.image_height, opt.image_width
    rng = np.random.default_rng(0)

    infer = jax.jit(lambda v, label, style: model.inference(
        v, {"label": label, "style_image": style}))

    def eval_prog(v, label, style):
        fake = model.inference(v, {"label": label, "style_image": style})
        return image_ops.to_255(image_ops.resize_bilinear(fake, 640, 400))

    eval_jit = jax.jit(eval_prog)

    rows = []
    for bs in args.batches:
        label = jnp.asarray(rng.integers(0, 4, (bs, h, w)).astype(np.uint8))
        style = jnp.asarray(rng.uniform(
            -1, 1, (bs, opt.input_ns, h, w, 1)).astype(np.float32))
        t_inf = timeit(infer, (variables, label, style))
        t_eval = timeit(eval_jit, (variables, label, style))
        row = {"bs": bs,
               "inference_ms": round(t_inf * 1e3, 2),
               "inference_img_s": round(bs / t_inf, 1),
               "eval_ms": round(t_eval * 1e3, 2),
               "eval_img_s": round(bs / t_eval, 1)}
        rows.append(row)
        print(row, file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
