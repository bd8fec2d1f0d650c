"""Fused SPADE+Style denormalization Pallas kernel.

The SPADE+Style norm (reference: models/networks/normalization.py:172-192)
computes, per site:

    actv  = relu(conv3x3(seg_at_res, Ws) + bs)          # 128-ch hidden
    gamma = conv3x3(actv, Wg) + bg                      # C-ch
    beta  = conv3x3(actv, Wb) + bb
    spade = normalize(x) * (1 + gamma) + beta           # batch/instance stats
    adain = x * (s0 + 1) + s1                           # per-(N,C) style
    out   = (spade + adain) / 2

XLA materializes gamma and beta in HBM and reads ``actv`` twice for every one
of the ~16 norm sites per generator forward.  This kernel computes gamma/beta
tile-wise in VMEM and applies the whole modulation in one pass: per tile the
only HBM traffic is one read of x, one read of the actv row band (with a
1-pixel halo), and one write of out — gamma/beta never exist in HBM.

The tiny seg->actv conv (4 input channels) stays in XLA: Mosaic DMA requires
lane dimensions that are 128-aligned or full, which a 4-channel array cannot
satisfy; 128-channel actv can.  Zero-padding actv in XLA also reproduces
torch's conv zero-padding exactly.

The 3x3 convs run as 9 shifted (pixels x 128) @ (128 x C) MXU matmuls.

Gradients: ``fused_spade_style`` carries a custom VJP whose backward runs the
XLA autodiff of the reference math (rematerialization — the fused forward
stores no intermediates; backward recomputes them).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
NHIDDEN = 128  # hardcoded in the reference (normalization.py:81)


# --------------------------------------------------------------------- #
# reference (XLA) math — also the backward path and the fallback
# --------------------------------------------------------------------- #
def _conv3x3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def seg_mlp_shared(seg, ws, bs):
    """actv = relu(conv3x3(seg, ws) + bs); shared by both paths."""
    return jax.nn.relu(_conv3x3(seg, ws, bs))


def spade_style_reference(x, seg, style, mean, var,
                          ws, bs, wg, bg, wb, bb, eps: float = EPS):
    """Unfused math. x:(N,H,W,C); seg:(N,H,W,S); style:(N,2C);
    mean/var:(N,C)."""
    c = x.shape[-1]
    # at-least-f32 epilogue dtype: f32 for f32/bf16 inputs (unchanged),
    # f64 under the float64 verification mode (models/layers.at_least_f32)
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(f32)
    actv = seg_mlp_shared(seg.astype(x.dtype), ws, bs)
    gamma = _conv3x3(actv, wg, bg).astype(f32)
    beta = _conv3x3(actv, wb, bb).astype(f32)
    normalized = (x32 - mean[:, None, None, :]) * \
        jax.lax.rsqrt(var[:, None, None, :] + eps)
    spade = normalized * (1.0 + gamma) + beta
    s0 = style[:, :c].astype(f32)[:, None, None, :]
    s1 = style[:, c:].astype(f32)[:, None, None, :]
    adain = x32 * (s0 + 1.0) + s1
    return ((spade + adain) * 0.5).astype(x.dtype)


# --------------------------------------------------------------------- #
# pallas kernel
# --------------------------------------------------------------------- #
def _kernel(actv_hbm, x_ref, s0_ref, s1_ref, mean_ref, var_ref,
            wcat_ref, bcat_ref,
            out_ref, band3, sem, *, th: int, eps: float):
    """One (n, i) row band.

    gamma/beta weights arrive CONCATENATED along output channels
    (wcat: (3,3,128,2C)) so each (dy,dx) tap is ONE MXU dot with 2C output
    lanes — at the generator's smallest site (C=64) that fills all 128 lanes
    where separate gamma/beta dots would waste half, and it halves the dot
    count everywhere.  The halo'd actv band is double-buffered: step k
    issues step k+1's DMA before its own compute, so the copy rides under
    the matmuls.  (Measured: the dx sublane-shifted patch reads are free —
    a dx=0-only variant times identically — so no DMA-side shift tricks.)
    """
    i = pl.program_id(1)
    nh_grid = pl.num_programs(1)
    step = pl.program_id(0) * nh_grid + i
    num_steps = pl.num_programs(0) * nh_grid
    slot = jax.lax.rem(step, 2)
    nxt = step + 1
    tw = x_ref.shape[2]

    def band_dma(s, which_slot):
        nn = s // nh_grid
        ii = jax.lax.rem(s, nh_grid)
        return pltpu.make_async_copy(
            actv_hbm.at[nn, pl.ds(ii * th, th + 2)],
            band3.at[which_slot], sem.at[which_slot])

    # warm-up: first step fetches its own band
    @pl.when(step == 0)
    def _():
        band_dma(step, slot).start()

    # prefetch the next band into the other slot
    @pl.when(nxt < num_steps)
    def _():
        band_dma(nxt, 1 - slot).start()

    x = x_ref[0].astype(jnp.float32)               # (th, W, C)
    c = x.shape[-1]
    mean = mean_ref[0, 0]                          # (C,)
    var = var_ref[0, 0]
    s0 = s0_ref[0, 0]
    s1 = s1_ref[0, 0]
    normalized = (x - mean) * jax.lax.rsqrt(var + eps)
    adain = x * (s0 + 1.0) + s1

    band_dma(step, slot).wait()
    actv = band3[slot]                             # (th+2, W_pad, 128)

    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((th, tw, 2 * c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            # bf16 operands, f32 MXU accumulation (XLA conv semantics)
            patch = actv[dy:dy + th, dx:dx + tw, :]
            acc = acc + jax.lax.dot_general(
                patch, wcat_ref[dy, dx], dn,
                preferred_element_type=jnp.float32)
    acc = acc + bcat_ref[:]
    gamma = acc[:, :, :c]
    beta = acc[:, :, c:]

    spade = normalized * (1.0 + gamma) + beta
    out_ref[0] = ((spade + adain) * 0.5).astype(out_ref.dtype)


def _fused_forward(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb,
                   eps: float, interpret: bool):
    n, h, w, c = x.shape
    actv = seg_mlp_shared(seg.astype(x.dtype), ws, bs)
    # Mosaic DMA: pad the copied sublane dim (W) to the bf16 tile (16)
    w_pad = -(-(w + 2) // 16) * 16
    actv = jnp.pad(actv, ((0, 0), (1, 1), (1, w_pad - w - 1), (0, 0)))

    # pick th so the live VMEM footprint (2 dx-concat band slots + pipelined
    # x/out tiles + the f32 gamma|beta accumulator and norm temporaries) fits
    import os
    budget = int(os.environ.get("SEG2EYE_PALLAS_VMEM_MB", "10")) * 1024 * 1024
    th = 1
    for cand in (64, 40, 32, 20, 16, 10, 8, 5, 4, 2, 1):
        if h % cand != 0:
            continue
        est = (2 * (cand + 2) * w_pad * NHIDDEN * actv.dtype.itemsize  # band
               + 4 * cand * w * c * x.dtype.itemsize          # x, out (db'd)
               + 2 * cand * w * c * 4                         # gamma|beta acc
               + 4 * cand * w * c * 4)              # f32 norm temporaries
        if est <= budget:
            th = cand
            break
    th = int(os.environ.get("SEG2EYE_PALLAS_TH", th))
    if th < 1 or h % th != 0:
        raise ValueError(
            f"SEG2EYE_PALLAS_TH={th} must be >=1 and divide H={h}; a "
            f"non-dividing tile height would silently skip the bottom "
            f"{h % th} rows")
    grid = (n, h // th)

    kernel = functools.partial(_kernel, th=th, eps=eps)
    # (dy, dx, k, gamma|beta co): gamma and beta share each tap's dot,
    # riding the output lanes together
    wcat = jnp.concatenate([wg, wb], axis=-1).astype(x.dtype)
    bcat = jnp.concatenate([bg, bb], axis=-1).astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # padded actv (DMA'd)
            pl.BlockSpec((1, th, w, c), lambda n, i: (n, i, 0, 0),
                         memory_space=pltpu.VMEM),     # x
            pl.BlockSpec((1, 1, c), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),     # style scale
            pl.BlockSpec((1, 1, c), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),     # style offset
            pl.BlockSpec((1, 1, c), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),     # mean
            pl.BlockSpec((1, 1, c), lambda n, i: (n, 0, 0),
                         memory_space=pltpu.VMEM),     # var
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wcat
            pl.BlockSpec(memory_space=pltpu.VMEM),     # bcat
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, w_pad, NHIDDEN), actv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * 2 * NHIDDEN * c + 10 * x.size,
            bytes_accessed=(x.size * x.dtype.itemsize * 2
                            + actv.size * actv.dtype.itemsize),
            transcendentals=0),
    )(actv, x,
      style[:, None, :c].astype(jnp.float32),
      style[:, None, c:].astype(jnp.float32),
      mean[:, None, :].astype(jnp.float32),
      var[:, None, :].astype(jnp.float32),
      wcat, bcat)


def pallas_eligible(x_shape: Tuple[int, ...]) -> bool:
    """Measured dispatch window (v5e, bs16, crop 256; tools/bench_pallas.py).

    Per-site microbenchmarks with loop-carried data dependence through BOTH
    x and seg (so XLA cannot hoist the seg convs) show the fused kernel
    beats XLA's conv emitter at the mid-resolution/high-channel sites
    (80x64, C>=256: x1.02-1.10) and loses at very small spatial extents
    (MXU underfill) and at the largest planes, where XLA's convolution
    codegen reaches ~120 TF/s vs Mosaic's ~139 TF/s pure-dot ceiling minus
    pipeline overheads (~96 TF/s sustained).  Dispatch only where measured
    faster; the XLA path is numerically identical everywhere else.
    """
    n, h, w, c = x_shape
    return 4096 <= h * w <= 8192 and c >= 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_spade_style(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb,
                      eps: float = EPS, interpret: bool = False):
    return _fused_forward(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb,
                          eps, interpret)


def _fwd(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb, eps, interpret):
    out = _fused_forward(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb,
                         eps, interpret)
    return out, (x, seg, style, mean, var, ws, bs, wg, bg, wb, bb)


def _bwd(eps, interpret, residuals, g):
    # rematerialized backward through the reference math
    _, vjp = jax.vjp(
        lambda *args: spade_style_reference(*args, eps=eps), *residuals)
    return vjp(g)


fused_spade_style.defvjp(_fwd, _bwd)
