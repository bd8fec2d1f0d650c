"""Multiscale PatchGAN discriminator.

Parity notes (reference: models/networks/discriminator.py):
  * NLayerDiscriminator: k=4 convs with torch padding 2 (asymmetric output
    sizes reproduced via explicit padding), nf 64 -> min(512), n_layers_D=4,
    stride 1 on the last middle layer; first and final convs are plain
    (no spectral/norm), middle convs are spectral + param-free instance norm
    with bias removed (discriminator.py:76-116).
  * Returns per-layer intermediates (after each conv[+norm]+lrelu group) when
    feature matching is on (discriminator.py:110-116).
  * MultiscaleDiscriminator: num_D copies; input avg-pool downsampled
    (k3 s2 p1, count_include_pad=False) between scales (discriminator.py:30-63).
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax

from seg2eye_tpu.models.layers import (SpectralConv, SubNorm,
                                       parse_nonspade_norm, weight_init)
from seg2eye_tpu.ops.image import avg_pool_3x3s2


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4
    norm_d: str = "spectralinstance"
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False,
                 use_running_average: bool = False) -> List[jax.Array]:
        spectral, sub = parse_nonspade_norm(self.norm_d)
        init = weight_init(self.init_type, self.init_gain)
        pad = ((2, 2), (2, 2))
        results = []

        x = SpectralConv(self.ndf, (4, 4), strides=(2, 2), padding=pad,
                         use_bias=True, spectral=False, kernel_init=init,
                         name="model0_conv")(x)
        x = nn.leaky_relu(x, 0.2)
        results.append(x)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            x = SpectralConv(nf, (4, 4), strides=(stride, stride), padding=pad,
                             use_bias=sub in ("", "none"), spectral=spectral,
                             kernel_init=init,
                             name=f"model{n}_conv")(x, update_stats)
            x = SubNorm(sub, self.init_gain,
                        name=f"norm{n}")(x, use_running_average)
            x = nn.leaky_relu(x, 0.2)
            results.append(x)

        x = SpectralConv(1, (4, 4), strides=(1, 1), padding=pad,
                         use_bias=True, spectral=False, kernel_init=init,
                         name=f"model{self.n_layers}_conv")(x)
        results.append(x)
        return results


class MultiscaleDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4
    num_d: int = 2
    norm_d: str = "spectralinstance"
    get_intermediate_features: bool = True
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False,
                 use_running_average: bool = False) -> List[List[jax.Array]]:
        result = []
        for i in range(self.num_d):
            out = NLayerDiscriminator(self.ndf, self.n_layers, self.norm_d,
                                      self.init_type, self.init_gain,
                                      name=f"discriminator_{i}")(
                x, update_stats, use_running_average)
            if not self.get_intermediate_features:
                out = [out[-1]]
            result.append(out)
            if i != self.num_d - 1:
                x = avg_pool_3x3s2(x)
        return result
