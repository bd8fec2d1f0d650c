"""GAN / reconstruction / style losses, pure functions over pytrees.

Parity notes (reference: models/networks/loss.py):
  * ``gan_loss`` reproduces GANLoss for modes original|ls|hinge|w, including
    the multiscale list handling of GANLoss.__call__ (loss.py:85-99): the
    per-scale scalar losses are averaged over the number of scales.
  * ``feature_matching_loss`` reproduces the GAN_Feat term
    (models/pix2pix_model.py:233-242): L1 over every intermediate layer of
    every scale, scaled by lambda_feat / num_D (summed over layers).
  * ``gram_matrix``/``style_gram_loss`` reproduce loss.py:177-200.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from seg2eye_tpu.models.layers import at_least_f32


def _single_gan_loss(logits: jax.Array, target_is_real: bool,
                     for_discriminator: bool, mode: str) -> jax.Array:
    x = at_least_f32(logits)
    if mode == "original":
        target = jnp.ones_like(x) if target_is_real else jnp.zeros_like(x)
        # binary_cross_entropy_with_logits, mean-reduced
        return jnp.mean(jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x))))
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((x - target) ** 2)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
        # generator hinge aims for real (loss.py:74-76)
        return -jnp.mean(x)
    if mode == "w":
        return -jnp.mean(x) if target_is_real else jnp.mean(x)
    raise ValueError(f"Unexpected gan_mode {mode}")


def gan_loss(preds, target_is_real: bool, for_discriminator: bool,
             mode: str = "hinge") -> jax.Array:
    """Multiscale-aware GAN loss.

    ``preds`` is either a single logits array or a list (per scale) of lists
    (per layer) where the last element of each inner list is the final logits
    (reference: loss.py:85-99).
    """
    if isinstance(preds, (list, tuple)):
        total = 0.0
        for pred_i in preds:
            if isinstance(pred_i, (list, tuple)):
                pred_i = pred_i[-1]
            total = total + _single_gan_loss(pred_i, target_is_real,
                                             for_discriminator, mode)
        return total / len(preds)
    return _single_gan_loss(preds, target_is_real, for_discriminator, mode)


def feature_matching_loss(pred_fake: Sequence[Sequence[jax.Array]],
                          pred_real: Sequence[Sequence[jax.Array]],
                          lambda_feat: float) -> jax.Array:
    """Discriminator feature matching (models/pix2pix_model.py:233-242).

    L1 between fake/real intermediates of each scale (excluding the final
    logits), each weighted lambda_feat / num_D; real features are detached.
    """
    num_d = len(pred_fake)
    total = 0.0
    for i in range(num_d):
        for j in range(len(pred_fake[i]) - 1):
            real = jax.lax.stop_gradient(pred_real[i][j])
            l1 = jnp.mean(jnp.abs(at_least_f32(pred_fake[i][j]) -
                                  at_least_f32(real)))
            total = total + l1 * (lambda_feat / num_d)
    return total


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(at_least_f32(a) - at_least_f32(b)))


def l2_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((at_least_f32(a) - at_least_f32(b)) ** 2)


def gram_matrix(feat: jax.Array) -> jax.Array:
    """Gram matrix over an NHWC batch (reference loss.py:177-190 flattens
    (B,C,H,W) to (B*C, H*W); we flatten NHWC equivalently)."""
    b, h, w, c = feat.shape
    f = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b * c, h * w)
    g = jnp.dot(f, f.T,
                preferred_element_type=jnp.promote_types(f.dtype,
                                                         jnp.float32))
    return g / (b * c * h * w)


def style_gram_loss(feat_fake: jax.Array, feat_real: jax.Array) -> jax.Array:
    """StyleLoss (loss.py:193-200): MSE between gram matrices, target detached."""
    g_fake = gram_matrix(at_least_f32(feat_fake))
    g_real = jax.lax.stop_gradient(gram_matrix(at_least_f32(feat_real)))
    return jnp.mean((g_fake - g_real) ** 2)


def multi_feature_mse(feats_fake: List[jax.Array],
                      feats_real: List[jax.Array]) -> jax.Array:
    """Style feature-map loss (pix2pix_model.py:163-174): sum over feature
    levels of MSE between aggregated fake/real encoder features.

    Note: the reference's ``.detach()`` there is a no-op (it is not assigned),
    so gradients flow into both sides; we reproduce the effective behavior.
    """
    total = 0.0
    for ff, fr in zip(feats_fake, feats_real):
        total = total + l2_loss(ff, fr)
    return total


def multi_gram_loss(feats_fake: List[jax.Array],
                    feats_real: List[jax.Array]) -> jax.Array:
    """Gram loss summed over feature levels (pix2pix_model.py:176-187)."""
    total = 0.0
    for ff, fr in zip(feats_fake, feats_real):
        total = total + style_gram_loss(ff, fr)
    return total


VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(feats_fake: List[jax.Array],
             feats_real: List[jax.Array]) -> jax.Array:
    """SPADE perceptual loss: weighted L1 over the five relu{1..5}_1 VGG19
    slices (the fork's missing VGGLoss, constructed at pix2pix_model.py:38;
    implemented per SURVEY §7.3).  The target's features carry no generator
    gradient by construction (they come from data), matching the upstream's
    detach on y."""
    total = 0.0
    for wt, ff, fr in zip(VGG_SLICE_WEIGHTS, feats_fake, feats_real):
        total = total + wt * l1_loss(ff, fr)
    return total
