"""Per-stage roofline of the DeepLab forward on one chip.

The full RefineNet/SegNet forward runs ~20 ms (train stats) / ~15 ms (eval)
at (8,640,400) bf16 while its 1.27 TFLOP would take 6.4 ms at the v5e's
197 TF/s peak (tools/bench_deeplab_step.py).  This times each stage in
isolation — stem (7x7/2 conv + pool), each ResNet layer group, ASPP,
decoder, and the final 4x align-corners resize — with XLA-counted FLOPs,
to locate the gap before optimizing.

Each stage is initialized and timed standalone (eval-mode running stats),
so the numbers attribute time, they don't sum exactly to the fused full
forward (which benefits from cross-stage fusion).

Usage: python tools/probe_deeplab_breakdown.py [--bs 8]
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

import flax.linen as nn                                   # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402
import numpy as np                                        # noqa: E402

from seg2eye_tpu.models.deeplab import (ASPP, Bottleneck,  # noqa: E402
                                        Decoder, ResNetBackbone, kaiming_init)
from seg2eye_tpu.ops.image import resize_bilinear_ac      # noqa: E402
from seg2eye_tpu.utils.roofline import (flops_of, peak_flops,  # noqa: E402
                                        report as _report, timeit)

PEAK = peak_flops()


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=x.dtype,
                    kernel_init=kaiming_init(), name="conv1")(x)
        # f32 BN + cast back, matching the real model's stem exactly
        # (models/deeplab.py ResNetBackbone bn1) so the timing attribution
        # shares production numerics/fusion (round-2 advisor finding)
        dt = x.dtype
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         name="bn1")(x).astype(dt)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class Stage(nn.Module):
    """One ResNet layer group, standalone (matches ResNetBackbone.stage)."""
    planes: int
    blocks: int
    stride: int
    dilation: int
    multi_grid: tuple = ()

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            mg = self.multi_grid[i] if self.multi_grid else 1
            ds = i == 0 and (self.stride != 1
                             or x.shape[-1] != self.planes * 4)
            x = Bottleneck(self.planes, stride=self.stride if i == 0 else 1,
                           dilation=self.dilation * mg, downsample=ds,
                           name=f"block{i}")(x, train=False)
        return x


def bench(name, mod, shape, *extra_shapes, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=s).astype(np.float32), dtype=dtype)
          for s in (shape, *extra_shapes)]
    variables = mod.init(jax.random.PRNGKey(0), *xs)
    fn = jax.jit(lambda v, *a: mod.apply(v, *a))
    t = timeit(fn, (variables, *xs))
    fl = flops_of(fn, variables, *xs)
    _report(name, t, fl, PEAK, width=26)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    args = ap.parse_args()
    b = args.bs
    h, w = 640, 400  # production geometry (RefineNetConfig defaults)

    print(f"== DeepLab-resnet101 stage breakdown (bs={b}, {h}x{w}, bf16, "
          f"eval stats) ==")
    bench("stem 7x7/2+pool", Stem(), (b, h, w, 3))
    # os16: strides [1,2,2,1], dilations [1,1,1,2], MG [1,2,4] on layer4
    bench("layer1 (3 blk, 160x100)", Stage(64, 3, 1, 1), (b, h // 4, w // 4, 64))
    bench("layer2 (4 blk, /2)", Stage(128, 4, 2, 1), (b, h // 4, w // 4, 256))
    bench("layer3 (23 blk, /2)", Stage(256, 23, 2, 1), (b, h // 8, w // 8, 512))
    bench("layer4 (3 blk, MG d2)", Stage(512, 3, 1, 2, (1, 2, 4)),
          (b, h // 16, w // 16, 1024))
    bench("ASPP (os16)", ASPP(output_stride=16), (b, h // 16, w // 16, 2048))
    bench("decoder", Decoder(num_classes=4),
          (b, h // 16, w // 16, 256), (b, h // 4, w // 4, 256))
    # final align-corners 4x upsample of the C=4 logits
    up = lambda x: resize_bilinear_ac(x, h, w)  # noqa: E731
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h // 4, w // 4, 4))
                    .astype(np.float32), dtype=jnp.float32)
    fn = jax.jit(up)
    t = timeit(fn, (x,))
    _report("final 4x resize (C=4)", t, flops_of(fn, x), PEAK, width=26)


if __name__ == "__main__":
    main()
