"""SPADE+Style generator.

Parity notes (reference: models/networks/generator.py):
  * Start: seg map nearest-resized to (sh, sw) = (crop/2^n / aspect rounded,
    crop/2^n), 3x3 conv to 16*ngf channels (generator.py:52-73).
  * Body: head_0, G_middle_0/1, up_0..3 SPADE+Style ResNet blocks interleaved
    with 2x nearest upsampling; 'more'/'most' add upsamples, 'most' adds up_4
    (generator.py:75-98).
  * Final: conv_img(leaky_relu(x)) -> tanh (generator.py:99-101).

TPU-first design:
  * NHWC activations; one-hot seg pyramid precomputed once per forward and
    shared by every SPADE call at that resolution.
  * 2x upsample implemented as an exact nearest repeat (maps to cheap
    broadcast-reshape, fuses with the following conv under XLA).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import SpectralConv, weight_init
from seg2eye_tpu.models.normalization import (SpadeStyleResnetBlock,
                                              parse_norm_g)
from seg2eye_tpu.ops.image import resize_nearest


def upsample2x(x: jax.Array) -> jax.Array:
    """Exact 2x nearest upsample (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class SpadeStyleGenerator(nn.Module):
    ngf: int = 64
    output_nc: int = 1
    semantic_nc: int = 4
    crop_size: int = 256
    aspect_ratio: float = 0.8
    num_upsampling_layers: str = "normal"   # normal | more | most
    norm_g: str = "spectralspadebatch3x3"
    w_dim: int = 16
    init_type: str = "xavier"
    init_gain: float = 0.02
    # checkpoint each SPADE+Style block under autodiff (see Options.remat)
    remat: bool = False

    def latent_size(self):
        n_up = {"normal": 5, "more": 6, "most": 7}[self.num_upsampling_layers]
        sw = self.crop_size // (2 ** n_up)
        sh = round(sw / self.aspect_ratio)
        return sh, sw

    @nn.compact
    def __call__(self, seg: jax.Array, w: jax.Array,
                 update_stats: bool = False,
                 use_running_average: bool = False,
                 constrain=None) -> jax.Array:
        """seg: (B,H,W,semantic_nc) one-hot float; w: (B,w_dim).

        ``constrain`` (optional ``f(x) -> x``): activation sharding policy
        applied at every resolution change — see
        ``parallel.sharding.spatial_constraint``.  Required under spatially-
        sharded (context-parallel) serving so GSPMD never leaves a small-H
        activation on padded uneven shards, where partitioned convs
        miscompute borders.  ``None`` is the identity.
        """
        spectral, param_free, ks = parse_norm_g(self.norm_g)
        nf = self.ngf
        sh, sw = self.latent_size()
        cs = constrain if constrain is not None else (lambda t: t)

        init = weight_init(self.init_type, self.init_gain)

        def block(fin, fout, name):
            # static_argnums: (self, x, segmap, w, update_stats,
            # use_running_average) — the two trailing Python bools
            cls = (nn.remat(SpadeStyleResnetBlock, static_argnums=(4, 5))
                   if self.remat else SpadeStyleResnetBlock)
            return cls(fin, fout, spectral, param_free, ks,
                       init_type=self.init_type,
                       init_gain=self.init_gain, name=name)

        def run(blk, x, s):
            return cs(blk(x, cs(resize_nearest(seg, x.shape[1], x.shape[2])),
                          w, update_stats, use_running_average))

        x = cs(resize_nearest(seg, sh, sw))
        x = SpectralConv(16 * nf, (3, 3), spectral=False, kernel_init=init,
                         name="fc")(x)

        x = run(block(16 * nf, 16 * nf, "head_0"), x, seg)
        x = cs(upsample2x(x))
        x = run(block(16 * nf, 16 * nf, "G_middle_0"), x, seg)
        if self.num_upsampling_layers in ("more", "most"):
            x = cs(upsample2x(x))
        x = run(block(16 * nf, 16 * nf, "G_middle_1"), x, seg)

        x = cs(upsample2x(x))
        x = run(block(16 * nf, 8 * nf, "up_0"), x, seg)
        x = cs(upsample2x(x))
        x = run(block(8 * nf, 4 * nf, "up_1"), x, seg)
        x = cs(upsample2x(x))
        x = run(block(4 * nf, 2 * nf, "up_2"), x, seg)
        x = cs(upsample2x(x))
        x = run(block(2 * nf, 1 * nf, "up_3"), x, seg)

        if self.num_upsampling_layers == "most":
            x = cs(upsample2x(x))
            x = run(block(1 * nf, nf // 2, "up_4"), x, seg)

        x = SpectralConv(self.output_nc, (3, 3), spectral=False,
                         kernel_init=init,
                         name="conv_img")(nn.leaky_relu(x, 0.2))
        return jnp.tanh(x)
