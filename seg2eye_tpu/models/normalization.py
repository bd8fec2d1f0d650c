"""SPADE / AdaIN / SPADE+Style conditional normalization blocks.

Parity notes (reference: models/networks/normalization.py):
  * SPADE half: param-free norm (batch or instance per norm_G config), then
    gamma/beta from the seg map through a shared 128-ch 3x3 conv MLP,
    ``out = norm * (1 + gamma) + beta`` (normalization.py:63-105).
  * AdaIN half: FC(w -> 2C) with LeakyReLU inside FC, then
    ``x * (scale + 1) + offset`` (normalization.py:144-169).
  * ``SpadeStyleBlock``: (SPADE(x,seg) + AdaIN(x,w)) / 2
    (normalization.py:172-192).  The modulation math lives in exactly one
    place — ops/pallas/spade_style.py ``spade_style_reference`` (XLA) and the
    numerically-equal fused kernel; this module only owns the parameters and
    the normalization statistics.

TPU-first deviation: instead of re-interpolating the full-res seg map inside
every SPADE call (normalization.py:97 — up to 21 interpolations per generator
forward), the generator precomputes one nearest-resized seg pyramid per
resolution and passes the right level in.  Numerics are identical because
nearest-neighbor resampling commutes with reuse.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import (FCStyle, SpectralConv, at_least_f32,
                                       weight_init)


def parse_norm_g(norm_g: str) -> Tuple[bool, str, int]:
    """'spectralspadebatch3x3' -> (spectral=True, param_free='batch', ks=3)
    (reference: normalization.py:66-69 + architecture.py:31)."""
    spectral = "spectral" in norm_g
    cfg = norm_g.replace("spectral", "")
    assert cfg.startswith("spade"), norm_g
    rest = cfg[len("spade"):]
    ks = int(rest[-3])
    param_free = rest[:-3]
    return spectral, param_free, ks


class SpadeStyleBlock(nn.Module):
    """(SPADE + AdaIN)/2 combined conditional norm.

    Owns its parameters directly so the same weights drive either the fused
    Pallas kernel (ops/pallas/spade_style.py) or the unfused XLA math.
    Batch-norm running statistics follow torch semantics exactly: momentum
    0.1, biased variance for normalization, unbiased for the running update.
    """
    param_free: str = "batch"
    ks: int = 3
    use_pallas: bool = False
    nhidden: int = 128
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array, w: jax.Array,
                 use_running_average: bool = False) -> jax.Array:
        from seg2eye_tpu.ops.pallas import spade_style as K

        assert self.ks == 3, "fused path implements the default 3x3 SPADE"
        n, h, wd, c = x.shape
        s = segmap.shape[-1]
        init = weight_init(self.init_type, self.init_gain)
        zeros = nn.initializers.zeros
        ws = self.param("spade_mlp_shared_kernel", init,
                        (3, 3, s, self.nhidden))
        bs = self.param("spade_mlp_shared_bias", zeros, (self.nhidden,))
        wg = self.param("spade_mlp_gamma_kernel", init,
                        (3, 3, self.nhidden, c))
        bg = self.param("spade_mlp_gamma_bias", zeros, (c,))
        wb = self.param("spade_mlp_beta_kernel", init,
                        (3, 3, self.nhidden, c))
        bb = self.param("spade_mlp_beta_bias", zeros, (c,))
        style = FCStyle(c * 2, gain=1.0, name="adain_linear")(
            at_least_f32(w))                          # (N, 2C)

        x32 = at_least_f32(x)
        if self.param_free == "batch":
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))
            if use_running_average:
                mean, var = ra_mean.value, ra_var.value
            else:
                mean = jnp.mean(x32, axis=(0, 1, 2))
                var = jnp.var(x32, axis=(0, 1, 2))
                if not self.is_initializing() and \
                        self.is_mutable_collection("batch_stats"):
                    cnt = n * h * wd
                    # jax.core.max_dim instead of Python max: cnt may be a
                    # symbolic dimension under jax.export shape polymorphism
                    unbiased = var * (cnt / jax.core.max_dim(cnt - 1, 1))
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                    ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
            mean_nc = jnp.broadcast_to(mean, (n, c))
            var_nc = jnp.broadcast_to(var, (n, c))
        elif self.param_free == "instance":
            mean_nc = jnp.mean(x32, axis=(1, 2))
            var_nc = jnp.var(x32, axis=(1, 2))
        else:
            raise ValueError(self.param_free)

        if self.use_pallas and K.pallas_eligible(x.shape):
            return K.fused_spade_style(x, segmap.astype(jnp.float32), style,
                                       mean_nc, var_nc,
                                       ws, bs, wg, bg, wb, bb)
        return K.spade_style_reference(x, segmap.astype(x.dtype), style,
                                       mean_nc, var_nc,
                                       ws, bs, wg, bg, wb, bb)


class SpadeStyleResnetBlock(nn.Module):
    """ResNet block with SPADE+Style norms (reference:
    models/networks/architecture.py:13-62)."""
    fin: int
    fout: int
    spectral: bool = True
    param_free: str = "batch"
    ks: int = 3
    use_pallas: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x: jax.Array, segmap: jax.Array, w: jax.Array,
                 update_stats: bool = False,
                 use_running_average: bool = False) -> jax.Array:
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        norm = lambda name: SpadeStyleBlock(  # noqa: E731
            self.param_free, self.ks, self.use_pallas,
            init_type=self.init_type, init_gain=self.init_gain, name=name)
        conv = lambda feats, k, bias, name: SpectralConv(  # noqa: E731
            feats, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)),
            use_bias=bias, spectral=self.spectral,
            kernel_init=weight_init(self.init_type, self.init_gain),
            name=name)

        if learned_shortcut:
            x_s = conv(self.fout, 1, False, "conv_s")(
                norm("norm_s")(x, segmap, w, use_running_average), update_stats)
        else:
            x_s = x

        dx = conv(fmiddle, 3, True, "conv_0")(
            nn.leaky_relu(norm("norm_0")(x, segmap, w, use_running_average), 0.2),
            update_stats)
        dx = conv(self.fout, 3, True, "conv_1")(
            nn.leaky_relu(norm("norm_1")(dx, segmap, w, use_running_average), 0.2),
            update_stats)
        return x_s + dx
