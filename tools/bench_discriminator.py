"""Attribute the MultiscaleDiscriminator forward cost (22% MFU in
tools/bench_components.py) by timing stripped-down variants of the exact
geometry: which part of conv(4x4,s2,p2) + spectral-sigma + instance-norm +
avg-pool stack underperforms on the MXU?

Variants (all bf16, NHWC, B=2*bs concat batch, 320x256 input, 5 channels):
  convs      : the 8 convs + bias + lrelu only
  +sigma     : convs with kernel/sigma scalar divides (spectral-norm eval)
  +inorm     : + f32 instance norms after middle convs
  +pool      : + the count_include_pad=False 3x3s2 avg-pool between scales
  full       : the real MultiscaleDiscriminator.apply

Usage: python tools/bench_discriminator.py [--bs 16]
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

from seg2eye_tpu.models.discriminator import MultiscaleDiscriminator  # noqa: E402
from seg2eye_tpu.models.layers import instance_norm  # noqa: E402
from seg2eye_tpu.ops.image import avg_pool_3x3s2  # noqa: E402
from seg2eye_tpu.utils.roofline import timeit  # noqa: E402


def conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def scale_stack(x, kernels, sigma=False, inorm=False):
    # NLayer: conv0(5->64,s2) ... conv3(256->512,s1) conv4(512->1,s1)
    strides = [2, 2, 2, 1, 1]
    for i, (k, s) in enumerate(zip(kernels, strides)):
        if sigma and 0 < i < 4:
            k = k / (1.0 + jnp.sum(k * k) * 1e-12)   # scalar dep on k
        y = conv(x, k.astype(x.dtype), s)
        if inorm and 0 < i < 4:
            y = instance_norm(y)
        x = jax.nn.leaky_relu(y, 0.2) if i < 4 else y
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    args = ap.parse_args()
    b = 2 * args.bs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 320, 256, 5)).astype(np.float32),
                    jnp.bfloat16)
    chans = [(5, 64), (64, 128), (128, 256), (256, 512), (512, 1)]
    kernels = [jnp.asarray(rng.normal(size=(4, 4, i, o)).astype(np.float32))
               for i, o in chans]

    def two_scales(x, kernels, sigma=False, inorm=False, pool=False):
        o1 = scale_stack(x, kernels, sigma, inorm)
        x2 = avg_pool_3x3s2(x) if pool else x[:, ::2, ::2, :]
        o2 = scale_stack(x2, kernels, sigma, inorm)
        return o1, o2

    variants = {
        "convs": jax.jit(lambda x, ks: two_scales(x, ks)),
        "+sigma": jax.jit(lambda x, ks: two_scales(x, ks, sigma=True)),
        "+inorm": jax.jit(lambda x, ks: two_scales(x, ks, sigma=True,
                                                   inorm=True)),
        "+pool": jax.jit(lambda x, ks: two_scales(x, ks, sigma=True,
                                                  inorm=True, pool=True)),
    }
    for name, fn in variants.items():
        t = timeit(fn, (x, kernels))
        print(f"{name:>8}: {t*1e3:7.2f} ms")

    disc = MultiscaleDiscriminator()
    variables = jax.jit(disc.init)(jax.random.PRNGKey(0), x)
    full = jax.jit(lambda v, x: disc.apply(v, x, update_stats=False))
    t = timeit(full, (variables, x))
    print(f"{'full':>8}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
