"""Convolutional style encoder.

Parity notes (reference: models/networks/encoder.py):
  * 6 stride-2 3x3 spectral convs (bias removed by the norm wrapper) each
    followed by param-free instance norm; NO activation between layers — the
    reference builds Sequential(conv, norm) groups and only applies LeakyReLU
    once at the very end (encoder.py:28-71).  We reproduce that exactly.
  * Any input is bilinearly resized to 256x256 first (encoder.py:53-55).
  * Flatten 4x4x(8*ngf) -> fc_mu / fc_var Linear(-> w_dim) (encoder.py:46-48).
  * Returns (mu, logvar, [per-layer feature maps]).

TPU-first design: the per-sample python loop over k style images in the
reference (models/pix2pix_model.py:285) becomes a single (B*k) fused batch —
see ``encode_w`` in models/pix2pix.py.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import (SpectralConv, SubNorm, at_least_f32,
                                       parse_nonspade_norm, weight_init)
from seg2eye_tpu.ops.image import resize_bilinear


class ConvEncoder(nn.Module):
    ngf: int = 64
    w_dim: int = 16
    crop_size: int = 256
    norm_e: str = "spectralinstance"
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False,
                 use_running_average: bool = False,
                 constrain=None
                 ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
        """x: (N,H,W,1) in [-1,1]. Returns (mu, logvar, features).

        ``constrain``: optional per-resolution activation sharding policy
        (parallel.sharding.spatial_constraint) for spatially-sharded serving;
        keeps small-H activations off padded uneven shards where partitioned
        convs miscompute.  ``None`` is the identity."""
        spectral, sub = parse_nonspade_norm(self.norm_e)
        init = weight_init(self.init_type, self.init_gain)
        ndf = self.ngf
        cs = constrain if constrain is not None else (lambda t: t)
        if x.shape[1] != 256 or x.shape[2] != 256:
            x = resize_bilinear(x, 256, 256)
        x = cs(x)

        widths = [ndf, ndf * 2, ndf * 4, ndf * 8, ndf * 8]
        if self.crop_size >= 256:
            widths.append(ndf * 8)

        features = []
        for i, w_ch in enumerate(widths):
            # norm wrapper removes the conv bias (normalization.py:31-35)
            x = SpectralConv(w_ch, (3, 3), strides=(2, 2),
                             padding=((1, 1), (1, 1)),
                             use_bias=sub in ("", "none"),
                             spectral=spectral, kernel_init=init,
                             name=f"layer{i}")(x, update_stats)
            x = cs(SubNorm(sub, self.init_gain,
                           name=f"norm{i}")(x, use_running_average))
            features.append(x)

        out = nn.leaky_relu(x, 0.2)
        out = out.reshape(out.shape[0], -1)
        mu = nn.Dense(self.w_dim, kernel_init=init,
                      name="fc_mu")(at_least_f32(out))
        logvar = nn.Dense(self.w_dim, kernel_init=init,
                          name="fc_var")(at_least_f32(out))
        return mu, logvar, features
