"""VGG19 feature slices for the perceptual (VGG) loss.

The reference *references* VGGLoss (models/pix2pix_model.py:38 constructs it
when ``not opt.no_vgg_loss``) but the class is missing from the fork — dead
code guarded by the always-True default (SURVEY §2 C10, §7.3: "implement the
missing VGGLoss properly but keep no_vgg_loss=True default").  This is the
proper implementation, following the SPADE upstream the fork derives from:
torchvision ``vgg19.features`` evaluated to the five relu{1..5}_1
activations, L1-compared with weights [1/32, 1/16, 1/8, 1/4, 1].

TPU-native: one NHWC flax module returning all five slices in a single
forward (one XLA program, no per-slice submodule dispatch); parameters are
frozen (never handed to an optimizer) and live in the ``variables['VGG']``
collection, loaded via ``tools/convert_torch_checkpoint.py --vgg19_pth``
(no torch zoo reachable from TPU pods — same policy as the DeepLab
backbones, PARITY.md "Pretrained backbones").

Conv layers are named ``conv{i}`` after their torchvision
``features.{i}`` index so the checkpoint conversion is self-describing.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg19.features: conv index -> out channels, with maxpools
# between blocks; slices end after the relu of conv{1..5}_1.
_BLOCKS = (
    ((0, 64),),                                       # -> relu1_1
    ((2, 64), "M", (5, 128)),                         # -> relu2_1
    ((7, 128), "M", (10, 256)),                       # -> relu3_1
    ((12, 256), (14, 256), (16, 256), "M", (19, 512)),  # -> relu4_1
    ((21, 512), (23, 512), (25, 512), "M", (28, 512)),  # -> relu5_1
)


class VGG19Features(nn.Module):
    """(B,H,W,3) float in [-1,1] (SPADE feeds generator-range images
    directly, no ImageNet re-normalization) -> [relu1_1..relu5_1]."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        outs = []
        for block in _BLOCKS:
            for step in block:
                if step == "M":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    idx, feats = step
                    # compute dtype follows the input (bf16 under the
                    # model's compute_dtype policy — without the explicit
                    # dtype flax would promote back to the f32 params);
                    # the loss itself accumulates in f32 (ops/losses.l1_loss)
                    x = nn.Conv(feats, (3, 3),
                                padding=((1, 1), (1, 1)), dtype=x.dtype,
                                name=f"conv{idx}")(x)
                    x = nn.relu(x)
            outs.append(x)
        return outs


def to_rgb(x: jax.Array) -> jnp.ndarray:
    """(B,H,W,{1,3}) or (B,H,W) -> (B,H,W,3) f32: grayscale is repeated
    (the OpenEDS fork defaults to 1-channel eye images), RGB (--output_nc 3)
    passes through — VGG always consumes 3 channels."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 3:
        return x
    assert x.shape[-1] == 1, x.shape
    return jnp.repeat(x, 3, axis=-1)
