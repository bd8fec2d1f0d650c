"""Probe: int8 vs bf16 convolution throughput at the generator's dominant
conv sites (one chip).

v5e's MXU peak is 2x for s8xs8->s32 vs bf16 (394 vs 197 TOPS), so a
quantized serving path could in principle double generation throughput.
Whether XLA's conv emitter actually reaches int8 rates at SPADE-generator
geometries (3x3, NHWC, modest channel counts, large spatial planes) is an
empirical question — this tool answers it BEFORE any quantized model path
is built (same measure-first discipline as the Pallas close-out,
PARITY.md "Pallas status").

Timing: each variant is an in-graph lax.scan chain with a genuine data
dependence from step to step (the scalar y[0,0,0,0] folded back into the
carried input), so per-dispatch tunnel overhead is amortized and XLA cannot
hoist the conv (a first standalone-dispatch version of this tool measured
~2 ms of dispatch floor per call, swamping any MXU-rate difference).

Variants per site:
  bf16        — the production conv (baseline)
  int8-static — serving path with CALIBRATED activation scales: round/clip
                to int8 at a fixed scale (in a real network this fuses into
                the producing op's epilogue; here it pays a standalone pass
                over x, i.e. the measured win is conservative), s8xs8->s32
                conv, dequant to bf16
  int8-dyn    — dynamic per-tensor absmax quantization (an extra full
                reduction pass over x before the quantize)

Weight quantization (per-output-channel) happens outside the loop — static
weights are precomputed in any real quantized-serving artifact.

Usage: python tools/bench_int8_conv.py [--bs 16] [--out evidence/...json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

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
from jax import lax  # noqa: E402

from seg2eye_tpu.utils.roofline import peak_flops  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")
PAD = ((1, 1), (1, 1))


def conv(x, k, acc=None):
    return lax.conv_general_dilated(
        x, k, (1, 1), PAD, dimension_numbers=DN,
        preferred_element_type=acc)


def quantize_weight(k32):
    """Per-output-channel symmetric int8 (k: HWIO f32)."""
    kscale = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0  # (O,)
    kq = jnp.clip(jnp.round(k32 / kscale), -127, 127).astype(jnp.int8)
    return kq, kscale


def body_bf16(x, k, _kq, _ks, _s):
    return conv(x, k)


def body_int8_static(x, _k, kq, kscale, act_scale):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                  -127, 127).astype(jnp.int8)
    y = conv(xq, kq, jnp.int32)
    return (y.astype(jnp.float32) * (act_scale * kscale)).astype(x.dtype)


def body_int8_dyn(x, _k, kq, kscale, _s):
    act_scale = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                  -127, 127).astype(jnp.int8)
    y = conv(xq, kq, jnp.int32)
    return (y.astype(jnp.float32) * (act_scale * kscale)).astype(x.dtype)


def timed(body, x, k, kq, kscale, act_scale, iters):
    """Chain the conv through a scan with a data-dependent carry."""

    @jax.jit
    def chain(x):
        def step(x, _):
            y = body(x, k, kq, kscale, act_scale)
            # feed one scalar of y back into the carried input: genuine
            # data dependence (defeats LICM/CSE), numerically negligible
            x2 = x + (y[0, 0, 0, 0].astype(jnp.float32) * 1e-30).astype(x.dtype)
            return x2, ()
        x, _ = lax.scan(step, x, None, length=iters)
        return jnp.float32(x[0, 0, 0, 0])

    out = chain(x)                     # compile + warmup
    float(jax.device_get(out))
    t0 = time.time()
    out = chain(x)
    float(jax.device_get(out))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    bs = args.bs

    # generator conv sites at the production 320x256 'normal' config
    # (models/generator.py): (H, W, Cin, Cout), 3x3 stride 1
    sites = [
        ("G_middle", 20, 16, 1024, 1024),
        ("up_0.conv_0", 40, 32, 1024, 512),
        ("up_0.conv_1", 40, 32, 512, 512),
        ("up_1.conv_0", 80, 64, 512, 256),
        ("up_1.conv_1", 80, 64, 256, 256),
        ("up_2.conv_0", 160, 128, 256, 128),
        ("up_3.conv_0", 320, 256, 128, 64),
        ("spade.gamma@80x64", 80, 64, 128, 512),
        ("spade.gamma@320x256", 320, 256, 128, 64),
    ]

    peak = peak_flops()
    rng = np.random.default_rng(0)
    rows = []
    for name, h, w, ci, co in sites:
        x32 = rng.normal(size=(bs, h, w, ci)).astype(np.float32)
        k32 = rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.02
        x = jnp.asarray(x32, jnp.bfloat16)
        k = jnp.asarray(k32, jnp.bfloat16)
        kq, kscale = quantize_weight(jnp.asarray(k32))
        act_scale = jnp.float32(np.abs(x32).max() / 127.0)
        fl = 2.0 * bs * h * w * ci * co * 9
        t_b = timed(body_bf16, x, k, kq, kscale, act_scale, args.iters)
        t_s = timed(body_int8_static, x, k, kq, kscale, act_scale, args.iters)
        t_d = timed(body_int8_dyn, x, k, kq, kscale, act_scale, args.iters)
        row = {"site": name, "shape": [bs, h, w, ci, co], "tflop": fl / 1e12,
               "bf16_ms": t_b * 1e3, "int8_static_ms": t_s * 1e3,
               "int8_dyn_ms": t_d * 1e3,
               "bf16_tfs": fl / t_b / 1e12,
               "int8_static_tfs": fl / t_s / 1e12,
               "int8_dyn_tfs": fl / t_d / 1e12,
               "speedup_static": t_b / t_s, "speedup_dyn": t_b / t_d}
        rows.append(row)
        print(f"{name:22s} bf16 {t_b*1e3:7.2f}ms ({fl/t_b/1e12:6.1f} TF/s)"
              f"  int8-static {t_s*1e3:7.2f}ms (x{t_b/t_s:4.2f})"
              f"  int8-dyn {t_d*1e3:7.2f}ms (x{t_b/t_d:4.2f})",
              file=sys.stderr)

    out = {"device": jax.devices()[0].device_kind, "bs": bs,
           "iters": args.iters, "timing": "in-graph scan chain",
           "peak_bf16_tfs": peak / 1e12, "sites": rows}
    js = json.dumps(out, indent=1)
    print(js)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")


if __name__ == "__main__":
    main()
