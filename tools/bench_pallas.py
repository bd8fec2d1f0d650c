"""Microbenchmark: fused SPADE+Style Pallas kernel vs XLA at generator sites.

CSE-proof: each timed step feeds the output of the previous step back in as
x (data dependence chain), so XLA cannot hoist or dedupe the computation.
Timing syncs via device_get of a scalar (see bench.py note on axon).

Usage:  python tools/bench_pallas.py [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seg2eye_tpu.utils.platform import configure_from_env  # noqa: E402

configure_from_env()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
import numpy as np                                       # noqa: E402

from seg2eye_tpu.ops.pallas import spade_style as K      # noqa: E402

# (N, H, W, C) at bs=16, crop 256 (=> 320x256 images), ngf=64 — every
# pallas_eligible norm site in the generator forward (SURVEY §3.3)
SITES = [
    (16, 40, 32, 512),     # up_0 norm_1
    (16, 80, 64, 512),     # up_1 norm_0 / norm_s
    (16, 80, 64, 256),     # up_1 norm_1
    (16, 160, 128, 256),   # up_2 norm_0 / norm_s
    (16, 160, 128, 128),   # up_2 norm_1
    (16, 320, 256, 128),   # up_3 norm_0 / norm_s
    (16, 320, 256, 64),    # up_3 norm_1
]


def make_args(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)  # noqa
    x = f(n, h, w, c).astype(jnp.bfloat16)
    seg = jnp.asarray(rng.integers(0, 2, (n, h, w, 4)), jnp.float32)
    style = f(n, 2 * c) * 0.1
    mean = f(n, c) * 0.1
    var = jnp.abs(f(n, c)) + 0.5
    ws = f(3, 3, 4, 128) * 0.1
    bs = f(128) * 0.1
    wg = f(3, 3, 128, c) * 0.05
    bg = f(c) * 0.1
    wb = f(3, 3, 128, c) * 0.05
    bb = f(c) * 0.1
    return (x, seg, style, mean, var, ws, bs, wg, bg, wb, bb)


def timed(fn, args, iters):
    """Chain x through fn so every iteration depends on the previous.

    CRITICAL honesty detail: seg must ALSO depend on the loop carry.  The
    gamma/beta convs are functions of seg only; with a loop-invariant seg,
    XLA hoists them out of the scan (LICM) and the "XLA time" measures just
    the elementwise tail — that invalidated the round-1 microbench.  Adding
    a numerically-negligible but data-dependent term defeats the hoist in
    both paths equally.
    """
    x, seg, rest = args[0], args[1], args[2:]

    @jax.jit
    def chain(x, seg, rest):
        def body(x, _):
            seg_i = seg + x[0, 0, 0, 0].astype(jnp.float32) * 1e-30
            y = fn(x, seg_i, *rest)
            # keep dtype/shape; renormalize so the chain doesn't blow up
            return (y * 0.5).astype(x.dtype), ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.float32(x[0, 0, 0, 0])

    out = chain(x, seg, rest)      # compile+warmup
    float(jax.device_get(out))
    t0 = time.time()
    out = chain(x, seg, rest)
    float(jax.device_get(out))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    print(f"device={jax.devices()[0].device_kind!r}")
    tot_k = tot_x = 0.0
    for site in SITES:
        a = make_args(*site)
        n, h, w, c = site
        flops = 2 * n * h * w * 9 * 128 * (2 * c)  # gamma+beta convs
        t_xla = timed(K.spade_style_reference, a, args.iters)
        t_ker = timed(K.fused_spade_style, a, args.iters)
        tot_k += t_ker
        tot_x += t_xla
        print(f"site {str(site):>22}: kernel {t_ker*1e3:7.3f} ms "
              f"({flops/t_ker/1e12:6.1f} TF/s) | xla {t_xla*1e3:7.3f} ms "
              f"({flops/t_xla/1e12:6.1f} TF/s) | "
              f"{'KERNEL' if t_ker < t_xla else 'xla':>6} "
              f"x{t_xla/t_ker:.2f}")
    print(f"TOTAL one pass over sites: kernel {tot_k*1e3:.2f} ms | "
          f"xla {tot_x*1e3:.2f} ms | speedup x{tot_x/tot_k:.2f}")


if __name__ == "__main__":
    main()
