"""Component-level roofline breakdown of the fused train step on one chip.

For each piece (encoder fwd, generator fwd, discriminator fwd, G-step,
D-step, fused step) prints measured ms, XLA-counted TFLOP, achieved TF/s
and the implied MFU — so "where do the 211 ms go?" has a concrete answer.

Usage: python tools/bench_components.py [--bs 16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.models.pix2pix import Pix2Pix           # noqa: E402
from seg2eye_tpu.options import Options                  # noqa: E402
from seg2eye_tpu.train import state as state_lib         # noqa: E402
from seg2eye_tpu.train.steps import StepFunctions        # noqa: E402
from seg2eye_tpu.utils.roofline import (flops_of, peak_flops,  # noqa: E402
                                        report as _report, timeit)

# device-keyed peak (never a hardcoded v5e figure: on v4/v6e that would
# silently misreport MFU)
PEAK = peak_flops()


def report(name, t, fl):
    _report(name, t, fl, PEAK, width=28)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--reuse_fake", action="store_true")
    args = ap.parse_args()
    bs = args.bs

    opt = Options(batchSize=bs, compute_dtype="bfloat16",
                  reuse_fake=args.reuse_fake).finalize()
    model = Pix2Pix(opt)
    state = state_lib.create_state(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    h, w = opt.image_height, opt.image_width
    batch = {
        "label": jnp.asarray(rng.integers(0, 4, (bs, h, w))),
        "style_image": jnp.asarray(
            rng.uniform(-1, 1, (bs, opt.input_ns, h, w, 1)).astype(np.float32)),
        "target": jnp.asarray(
            rng.uniform(-1, 1, (bs, h, w, 1)).astype(np.float32)),
    }
    variables = state.variables

    seg, style, target = jax.jit(model.preprocess)(batch)

    # --- component forwards ---------------------------------------- #
    gen_fake = jax.jit(lambda v, s, st: model.generate_fake(
        v, s, st, train=True)[0])
    t = timeit(gen_fake, (variables, seg, style))
    report("E+G forward (train stats)", t, flops_of(gen_fake, variables, seg,
                                                    style))

    fake = gen_fake(variables, seg, style)
    disc = jax.jit(lambda v, s, f, r: model.discriminate(v, s, f, r, True))
    t = timeit(disc, (variables, seg, fake, target))
    report("D forward (2B concat)", t, flops_of(disc, variables, seg, fake,
                                                target))

    # --- losses w/ grad -------------------------------------------- #
    steps = StepFunctions(model, donate=False)
    t = timeit(steps.g_step, (state, batch))
    report("G step (fwd+bwd+adam)", t, flops_of(steps.g_step, state, batch))
    t = timeit(steps.d_step, (state, batch))
    report("D step (regen+fwd+bwd)", t, flops_of(steps.d_step, state, batch))
    t = timeit(steps.train_step, (state, batch))
    report("fused G+D step", t, flops_of(steps.train_step, state, batch))


if __name__ == "__main__":
    main()
