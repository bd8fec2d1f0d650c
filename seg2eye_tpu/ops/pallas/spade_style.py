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
    x32 = x.astype(jnp.float32)
    actv = seg_mlp_shared(seg.astype(x.dtype), ws, bs)
    gamma = _conv3x3(actv, wg, bg).astype(jnp.float32)
    beta = _conv3x3(actv, wb, bb).astype(jnp.float32)
    normalized = (x32 - mean[:, None, None, :]) * \
        jax.lax.rsqrt(var[:, None, None, :] + eps)
    spade = normalized * (1.0 + gamma) + beta
    s0 = style[:, :c].astype(jnp.float32)[:, None, None, :]
    s1 = style[:, c:].astype(jnp.float32)[:, None, None, :]
    adain = x32 * (s0 + 1.0) + s1
    return ((spade + adain) * 0.5).astype(x.dtype)


# --------------------------------------------------------------------- #
# pallas kernel
# --------------------------------------------------------------------- #
def _kernel(actv_hbm, x_ref, s0_ref, s1_ref, mean_ref, var_ref,
            wg_ref, bg_ref, wb_ref, bb_ref,
            out_ref, *, th: int, eps: float):
    nh = NHIDDEN
    n = pl.program_id(0)
    i = pl.program_id(1)
    tw = x_ref.shape[2]

    def body(actv_tile, sem):
        # DMA the (th+2, W+2, 128) zero-padded actv row band for this block
        dma = pltpu.make_async_copy(
            actv_hbm.at[n, pl.ds(i * th, th + 2)], actv_tile, sem)
        dma.start()

        x = x_ref[0].astype(jnp.float32)               # (th, W, C)
        c = x.shape[-1]
        mean = mean_ref[0, 0]                          # (C,)
        var = var_ref[0, 0]
        s0 = s0_ref[0, 0]
        s1 = s1_ref[0, 0]
        normalized = (x - mean) * jax.lax.rsqrt(var + eps)
        adain = x * (s0 + 1.0) + s1

        dma.wait()
        actv = actv_tile[:]                            # (th+2, W_pad, 128)

        # 3D dot_general keeps the (sublane, lane) layout intact — a 2D
        # reshape of a sliced tile would force a relayout copy per patch
        dn = (((2,), (0,)), ((), ()))
        accg = jnp.zeros((th, tw, c), jnp.float32)
        accb = jnp.zeros((th, tw, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                # bf16 operands, f32 MXU accumulation (XLA conv semantics)
                patch = actv[dy:dy + th, dx:dx + tw, :]
                accg = accg + jax.lax.dot_general(
                    patch, wg_ref[dy, dx], dn,
                    preferred_element_type=jnp.float32)
                accb = accb + jax.lax.dot_general(
                    patch, wb_ref[dy, dx], dn,
                    preferred_element_type=jnp.float32)
        gamma = accg + bg_ref[:]
        beta = accb + bb_ref[:]

        spade = normalized * (1.0 + gamma) + beta
        out_ref[0] = ((spade + adain) * 0.5).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        actv_tile=pltpu.VMEM((th + 2, actv_hbm.shape[2], NHIDDEN),
                             actv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def _fused_forward(x, seg, style, mean, var, ws, bs, wg, bg, wb, bb,
                   eps: float, interpret: bool):
    n, h, w, c = x.shape
    actv = seg_mlp_shared(seg.astype(x.dtype), ws, bs)
    # Mosaic DMA: the copied sublane dim must be 8-aligned -> pad W+2 up
    w_pad = -(-(w + 2) // 8) * 8
    actv = jnp.pad(actv, ((0, 0), (1, 1), (1, w_pad - w - 1), (0, 0)))

    # pick th so the live VMEM footprint (actv tile + x/out tiles + f32
    # gamma/beta accumulators and temporaries) stays comfortably bounded
    budget = 6 * 1024 * 1024
    th = 1
    for cand in (64, 40, 32, 20, 16, 10, 8, 5, 4, 2, 1):
        if h % cand != 0:
            continue
        est = ((cand + 2) * w_pad * NHIDDEN * actv.dtype.itemsize  # actv tile
               + 2 * cand * w * c * x.dtype.itemsize               # x, out
               + 6 * cand * w * c * 4)       # gamma/beta/norm f32 temporaries
        if est <= budget:
            th = cand
            break
    grid = (n, h // th)

    kernel = functools.partial(_kernel, th=th, eps=eps)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wg
            pl.BlockSpec(memory_space=pltpu.VMEM),     # bg
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wb
            pl.BlockSpec(memory_space=pltpu.VMEM),     # bb
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
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
      wg.astype(x.dtype), bg.astype(jnp.float32),
      wb.astype(x.dtype), bb.astype(jnp.float32))


def pallas_eligible(x_shape: Tuple[int, ...]) -> bool:
    """Use the kernel where it pays: large spatial, moderate channels."""
    n, h, w, c = x_shape
    return h * w >= 1024 and c <= 512


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
