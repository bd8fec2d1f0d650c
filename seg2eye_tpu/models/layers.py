"""Shared building blocks: initializers, spectral norm, param-free norms.

Parity notes:
  * ``xavier_normal_init`` matches torch init.xavier_normal_(gain) with the
    torch fan convention (fan includes the receptive field), used by
    BaseNetwork.init_weights (reference: models/networks/base_network.py:28-52,
    init_type='xavier', gain=opt.init_variance=0.02).
  * ``SpectralConv`` matches torch.nn.utils.spectral_norm semantics: one power
    iteration per training forward, u persisted, sigma treated as a function
    of the kernel with u/v stopped (reference wraps convs in
    models/networks/normalization.py:26, architecture.py:31-35).
    The power-iteration vector lives in the mutable ``spectral`` collection.
  * ``instance_norm`` = torch InstanceNorm2d(affine=False) (eps 1e-5, always
    batch statistics — torch's track_running_stats defaults to False).
  * Param-free batch norm uses flax BatchNorm(use_scale=False, use_bias=False)
    with torch's momentum (0.1 -> flax momentum 0.9).  Under a sharded batch
    the plain jnp reductions become cross-device collectives automatically,
    giving synchronized BN over the ``data`` mesh axis (the TPU-idiomatic
    replacement for the reference's threaded SyncBN,
    refinenet/deeplab/modeling/sync_batchnorm/).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _torch_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """fan_in/fan_out with torch's convention. Kernel layouts:
    conv HWIO (kh,kw,I,O); linear (I,O)."""
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    else:
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    return fan_in, fan_out


def xavier_normal_init(gain: float = 0.02) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _torch_fans(shape)
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.normal(key, shape, dtype) * std
    return init


def weight_init(init_type: str = "xavier", gain: float = 0.02) -> Callable:
    """BaseNetwork.init_weights parity (base_network.py:28-52):
    normal | xavier | xavier_uniform | kaiming | orthogonal | none."""
    if init_type == "xavier":
        return xavier_normal_init(gain)
    if init_type == "normal":
        return lambda key, shape, dtype=jnp.float32: \
            jax.random.normal(key, shape, dtype) * gain
    if init_type == "xavier_uniform":
        def xu(key, shape, dtype=jnp.float32):
            fan_in, fan_out = _torch_fans(shape)
            a = (6.0 / (fan_in + fan_out)) ** 0.5      # gain fixed to 1.0
            return jax.random.uniform(key, shape, dtype, -a, a)
        return xu
    if init_type == "kaiming":
        def kn(key, shape, dtype=jnp.float32):
            fan_in, _ = _torch_fans(shape)
            return jax.random.normal(key, shape, dtype) * (2.0 / fan_in) ** 0.5
        return kn
    if init_type == "orthogonal":
        def orth(key, shape, dtype=jnp.float32):
            flat = (int(np.prod(shape[:-1])), shape[-1]) if len(shape) > 1 \
                else (1, shape[0])
            init = jax.nn.initializers.orthogonal(scale=gain)
            return init(key, flat, dtype).reshape(shape)
        return orth
    if init_type == "none":
        # torch conv default: kaiming_uniform(a=sqrt(5)) ~ U(+-1/sqrt(fan_in))
        def default(key, shape, dtype=jnp.float32):
            fan_in, _ = _torch_fans(shape)
            bound = (1.0 / fan_in) ** 0.5 * (3.0 ** 0.5)
            return jax.random.uniform(key, shape, dtype, -bound, bound)
        return default
    raise NotImplementedError(
        f"initialization method [{init_type}] is not implemented")


def he_fc_init(gain: float = 1.0) -> Callable:
    """StyleGAN FC init: randn * gain * in^-0.5 with lrmul=1
    (reference: models/networks/normalization.py:108-129, use_wscale=False)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _torch_fans(shape)
        std = gain * fan_in ** (-0.5)
        return jax.random.normal(key, shape, dtype) * std
    return init


def at_least_f32(x: jax.Array) -> jax.Array:
    """Stat/accumulation dtype policy: widen bf16 to f32, keep f32 — and
    keep f64 (the float64 verification mode, ``compute_dtype='float64'``,
    exists so the lockstep oracle can measure our trajectory against
    torch-float64 without f32 casts truncating it —
    tools/check_reference_parity.py check_lockstep_dynamics)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Param-free instance norm over (H, W), NHWC."""
    x32 = at_least_f32(x)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def parse_nonspade_norm(norm_type: str):
    """'spectralinstance' -> (spectral=True, 'instance')
    (reference: get_nonspade_norm_layer, normalization.py:15-47)."""
    spectral = norm_type.startswith("spectral")
    sub = norm_type[len("spectral"):] if spectral else norm_type
    if sub not in ("", "none", "instance", "batch"):
        raise ValueError(f"normalization layer {sub} is not recognized")
    return spectral, sub


class SubNorm(nn.Module):
    """The norm appended by get_nonspade_norm_layer: param-free instance,
    affine batch (bias removed from the preceding conv), or none."""
    sub: str = "instance"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        if self.sub in ("", "none"):
            return x
        if self.sub == "instance":
            return instance_norm(x)
        if self.sub == "batch":
            # BaseNetwork.init_weights sets BN weight ~ N(1, gain).
            # TorchBatchNorm, not flax nn.BatchNorm: the 'spectralbatch'
            # norm_D/norm_E variants must get the same torch-exact
            # two-pass variance + Bessel-corrected running update as the
            # DeepLab stacks (see TorchBatchNorm below).
            return TorchBatchNorm(
                use_running_average=use_running_average,
                scale_init=lambda key, shape, dtype=jnp.float32:
                1.0 + jax.random.normal(key, shape, dtype) * self.init_gain,
            )(x).astype(x.dtype)
        raise ValueError(self.sub)


class TorchBatchNorm(nn.Module):
    """Affine BatchNorm with EXACT torch.nn.BatchNorm2d training semantics.

    flax's nn.BatchNorm differs from torch in two ways that the RefineNet
    torch oracle (tools/check_reference_parity.py check_refinenet_wrapper)
    exposed on the 100+-BN DeepLab stacks:

      * variance: flax defaults to the one-pass E[x^2]-E[x]^2 form, which
        cancels catastrophically on post-ReLU activations (mean ~ std);
        torch computes the two-pass E[(x-E[x])^2].  Reproduced here.
      * running-var update: torch blends the Bessel-corrected (unbiased,
        n/(n-1)) batch variance into running_var (batch_norm_cpu semantics)
        while flax blends the biased one.  Negligible at production spatial
        sizes (n = B*H*W >= 8000 -> <0.02%) but 3% at the toy-geometry
        oracle's ASPP bottleneck (n=32).  Reproduced here.

    Also backs SubNorm's 'batch' path (the reference-legal spectralbatch
    norm_D/norm_E variants), so every BN in the repo shares these
    semantics.  Variable names/collections match nn.BatchNorm (params
    {scale,bias}, batch_stats {mean,var}) so every converter/exporter is
    unaffected.
    Stats and normalization compute in f32; the result is returned in f32
    (call sites cast back to the compute dtype, as before).
    """
    use_running_average: bool = False
    momentum: float = 0.9                       # retain factor, torch 1-0.1
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xf = at_least_f32(x)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            n = 1
            for ax in red:
                n *= x.shape[ax]
            mean = jnp.mean(xf, red)
            var = jnp.mean(jnp.square(xf - mean), red)   # two-pass, biased
            if not self.is_initializing():
                # jax.core.max_dim instead of a Python conditional: n may
                # be a symbolic dimension under jax.export shape
                # polymorphism (same convention as normalization.py SPADE
                # param-free BN)
                bessel = n / jax.core.max_dim(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var * bessel)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


class SpectralConv(nn.Module):
    """2D conv with optional spectral normalization (NHWC / HWIO).

    ``padding`` takes explicit ((t,b),(l,r)) pairs to reproduce torch conv
    shape arithmetic exactly (e.g. the k=4 p=2 discriminator convs,
    models/networks/discriminator.py:87-103).
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    use_bias: bool = True
    spectral: bool = True
    kernel_init: Callable = xavier_normal_init(0.02)
    dtype: Any = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features))
        if self.spectral:
            # torch reshapes (O,I,kh,kw)->(O,N); we use M=(O,N) built from HWIO.
            # Power-iteration semantics match torch exactly: training forward
            # updates v = normalize(M^T u), u = normalize(M v) and persists
            # BOTH; eval uses the stored pair untouched.
            w_mat = kernel.reshape(-1, self.features).T  # (O, N)
            n_in = w_mat.shape[1]

            def rng():
                return (self.make_rng("params") if self.has_rng("params")
                        else jax.random.PRNGKey(0))

            u_var = self.variable(
                "spectral", "u",
                lambda: _l2_normalize(jax.random.normal(
                    rng(), (self.features,))))
            v_var = self.variable(
                "spectral", "v",
                lambda: _l2_normalize(jax.lax.stop_gradient(
                    kernel.reshape(-1, self.features).T).T @ u_var.value))
            u, v = u_var.value, v_var.value
            if update_stats and not self.is_initializing():
                w_ng = jax.lax.stop_gradient(w_mat)
                v = _l2_normalize(w_ng.T @ u)
                u = _l2_normalize(w_ng @ v)
                u_var.value = u
                v_var.value = v
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            sigma = jnp.dot(u, w_mat @ v)
            kernel = kernel / sigma

        dtype = self.dtype or x.dtype
        # NOTE: no preferred_element_type here — with bf16 operands the MXU
        # already accumulates in f32 internally, and mixing a f32 preferred
        # type with bf16 operands breaks the conv VJP dtype matching.
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y.astype(dtype)


class FCStyle(nn.Module):
    """StyleGAN 'FC' layer: scaled linear + LeakyReLU(0.2)
    (reference: models/networks/normalization.py:108-141; the class name 'FC'
    escapes BaseNetwork.init_weights' re-init, so the custom He init is the
    effective one)."""
    features: int
    gain: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", he_fc_init(self.gain),
                       (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.dot(at_least_f32(x), w) + b
        return nn.leaky_relu(y, 0.2).astype(x.dtype)


def leaky_relu02(x: jax.Array) -> jax.Array:
    return nn.leaky_relu(x, 0.2)


def param_count(params) -> int:
    import math
    return sum(math.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
