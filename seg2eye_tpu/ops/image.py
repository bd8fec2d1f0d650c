"""In-graph image ops (NHWC everywhere — the TPU-preferred layout).

These replace the host-side library calls of the reference (cv2.resize,
F.interpolate, F.avg_pool2d, one-hot scatter) with static-shape XLA ops so the
whole forward/score path stays on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def one_hot_label(label: jax.Array, num_classes: int) -> jax.Array:
    """Label map -> one-hot channels.

    Replaces the FloatTensor.scatter_ one-hot in the reference
    (models/pix2pix_model.py:151-154).  Accepts (B,H,W) or (B,H,W,1) int.
    Returns (B,H,W,num_classes) float32.
    """
    if label.ndim == 4:
        label = label[..., 0]
    return jax.nn.one_hot(label, num_classes, dtype=jnp.float32)


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    # torch F.interpolate(mode='nearest') samples src index floor(i*in/out)
    return np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest').

    (reference: models/networks/normalization.py:97 — SPADE re-interpolates the
    seg map with nearest mode; generator.py:72 downsamples it the same way.)
    NHWC, static output size; lowered as two cheap gathers.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    rows = _nearest_indices(out_h, h)
    cols = _nearest_indices(out_w, w)
    return x[:, rows][:, :, cols]


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Half-pixel bilinear resize WITHOUT antialiasing (NHWC).

    Matches torch F.interpolate(mode='bilinear', align_corners=False)
    (encoder.py:54-55) and cv2.resize INTER_LINEAR (postprocessor.py:113)
    exactly, including on downscale — jax.image.resize antialiases when
    downscaling, which torch/cv2 do not, so this is built from two 1-D
    gather interpolations with positions (i+0.5)*in/out - 0.5 clamped.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis(out_n, in_n):
        pos = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
        pos = np.clip(pos, 0.0, in_n - 1)
        lo = np.minimum(np.floor(pos).astype(np.int32), in_n - 1)
        hi = np.minimum(lo + 1, in_n - 1)
        # keep f64 weights; cast to the compute dtype below (f32 for
        # f32/bf16 inputs — unchanged — f64 under the verification mode)
        frac = pos - lo
        return lo, hi, frac

    hlo, hhi, hf = axis(out_h, h)
    wlo, whi, wf = axis(out_w, w)
    dt = x.dtype
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    hf = hf.astype(xf.dtype)
    wf = wf.astype(xf.dtype)
    top = xf[:, hlo]
    bot = xf[:, hhi]
    xh = top + (bot - top) * hf[None, :, None, None]
    left = xh[:, :, wlo]
    right = xh[:, :, whi]
    out = left + (right - left) * wf[None, None, :, None]
    return out.astype(dt)


def resize_bilinear_ac(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with align_corners=True (NHWC), matching torch
    F.interpolate(..., mode='bilinear', align_corners=True) as used throughout
    DeepLabV3+ (reference: refinenet/deeplab/modeling/deeplab.py:31,
    aspp.py:76, decoder.py:40).

    Implemented as two 1-D linear gathers with sample positions
    i*(in-1)/(out-1) — cheap, static, fuses under XLA.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(out_n, in_n):
        if out_n == 1 or in_n == 1:
            lo = np.zeros(out_n, np.int32)
            return lo, lo, np.zeros(out_n, np.float64)
        pos = np.arange(out_n) * (in_n - 1) / (out_n - 1)
        lo = np.floor(pos).astype(np.int32)
        lo = np.minimum(lo, in_n - 2)
        return lo, lo + 1, pos - lo

    hlo, hhi, hf = axis_weights(out_h, h)
    wlo, whi, wf = axis_weights(out_w, w)
    dt = x.dtype
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    hf = hf.astype(xf.dtype)
    wf = wf.astype(xf.dtype)
    top = xf[:, hlo]
    bot = xf[:, hhi]
    xh = top + (bot - top) * hf[None, :, None, None]
    left = xh[:, :, wlo]
    right = xh[:, :, whi]
    out = left + (right - left) * wf[None, None, :, None]
    return out.astype(dt)


def avg_pool_3x3s2(x: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 average pool with count_include_pad=False.

    (reference: models/networks/discriminator.py:47-50 — the multiscale
    discriminator downsampler.)  NHWC.
    """
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, padding)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides, padding)
    return summed / counts


def to_255(x: jax.Array) -> jax.Array:
    """[-1,1] -> [0,255] ints (truncated), matching ImageProcessor.unnormalize
    (data/postprocessor.py:58-72 — `.int()` truncates toward zero)."""
    return jnp.trunc((x + 1.0) * 255.0 / 2.0)


def to_255resized(x: jax.Array, w: int = 400, h: int = 640) -> jax.Array:
    """[-1,1] NHWC batch -> bilinear resize to (h,w) -> [0,255] truncated ints.

    In-graph equivalent of ImageProcessor.to_255resized_imagebatch
    (data/postprocessor.py:97-104): resize first (float), then unnormalize.
    """
    return to_255(resize_bilinear(x.astype(jnp.float32), h, w))


def flip_horizontal(x: jax.Array) -> jax.Array:
    """Left-right flip, NHWC (reference: data/base_dataset.py:139-147)."""
    return x[:, :, ::-1, :]


def colorize_segmap(segmap: jax.Array) -> jax.Array:
    """Map the 4 OpenEDS classes to their mean intensities.

    (reference: refinenet/dataset.py:61-71 — class -> mean gray value, cast to
    uint8 there; we keep float and let callers normalize.)
    """
    means = jnp.array([125.73929, 103.19314, 76.50751, 34.1294], jnp.float32)
    # reference stores result as uint8, i.e. the means are truncated
    means = jnp.floor(means)
    return means[segmap.astype(jnp.int32)]
