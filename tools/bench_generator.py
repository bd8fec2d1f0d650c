"""Attribute the E+G forward cost (53% MFU in tools/bench_components.py):
time the encoder and generator separately, and the generator with batch
statistics vs running statistics (bounds the cost of the cross-batch BN
reductions + spectral/stat updates that training mode adds).

Usage: python tools/bench_generator.py [--bs 16]
"""
from __future__ import annotations

import argparse
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
from seg2eye_tpu.options import Options  # noqa: E402
from seg2eye_tpu.utils.roofline import (flops_of, peak_flops,  # noqa: E402
                                        report as _report, timeit)

PEAK = peak_flops()     # device-keyed, never a hardcoded v5e figure


def report(name, t, fl):
    _report(name, t, fl, PEAK, width=34)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    bs = args.bs

    opt = Options(batchSize=bs, compute_dtype="bfloat16").finalize()
    model = Pix2Pix(opt)
    variables = model.init_variables(jax.random.PRNGKey(0), with_disc=False)
    h, w = opt.image_height, opt.image_width
    rng = np.random.default_rng(0)
    seg = jnp.asarray(
        jax.nn.one_hot(rng.integers(0, 4, (bs, h, w)), 4), jnp.bfloat16)
    style = jnp.asarray(rng.uniform(
        -1, 1, (bs, opt.input_ns, h, w, 1)).astype(np.float32), jnp.bfloat16)
    wvec = jnp.asarray(rng.normal(size=(bs, opt.w_dim)).astype(np.float32))

    enc = jax.jit(lambda v, s: model.encode_w(v, s, train=True)[0])
    t = timeit(enc, (variables, style))
    report(f"encoder (B*k={bs*opt.input_ns}) train", t,
           flops_of(enc, variables, style))

    g_train = jax.jit(lambda v, s, wv: model.generate(v, s, wv, train=True)[0])
    t = timeit(g_train, (variables, seg, wvec))
    report("generator train (batch stats)", t,
           flops_of(g_train, variables, seg, wvec))

    opt_r = Options(batchSize=bs, compute_dtype="bfloat16",
                    eval_use_running_stats=True).finalize()
    model_r = Pix2Pix(opt_r)
    g_run = jax.jit(lambda v, s, wv: model_r.generate(v, s, wv, train=False)[0])
    t = timeit(g_run, (variables, seg, wvec))
    report("generator eval (running stats)", t,
           flops_of(g_run, variables, seg, wvec))


if __name__ == "__main__":
    main()
