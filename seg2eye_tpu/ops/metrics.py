"""OpenEDS challenge metric, in-graph.

Parity notes (reference: models/networks/loss.py:102-174):
  * ``openeds_accuracy`` = sqrt(sum((a-b)^2)) / (H*W) per image.
  * ``mse_for_images`` expects [0,255]-range 640x400 images (loss.py:117-121).
  * ``mse_for_tensors`` expects [-1,1] tensors, converts via the truncating
    to_255 path (loss.py:136-156).
  * ``error_statistics`` multiplies the mean by 1471, the test-set size
    (loss.py:158-174).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from seg2eye_tpu.models.layers import at_least_f32
from seg2eye_tpu.ops.image import to_255

RELATIVE_FACTOR = 1471  # OpenEDS test-set size (loss.py:169-173)


def openeds_accuracy(produced: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image sqrt(SSE)/(H*W). Accepts (..., H, W, C) NHWC batches and
    returns one scalar per leading batch element."""
    p = at_least_f32(produced)
    t = at_least_f32(target)
    h, w = p.shape[-3], p.shape[-2]
    sq = (p - t) ** 2
    sse = jnp.sum(sq.reshape(sq.shape[0], -1), axis=-1)
    return jnp.sqrt(sse) / (h * w)


def mse_for_images(produced: jax.Array, target: jax.Array) -> jax.Array:
    """[0,255]-range NHWC image batches -> per-image OpenEDS error."""
    assert produced.shape == target.shape
    return openeds_accuracy(produced, target)


def mse_for_tensors(produced: jax.Array, target: jax.Array) -> jax.Array:
    """[-1,1]-range NHWC batches -> per-image OpenEDS error; mean over batch
    is what the reference uses as --lambda_openeds training loss
    (models/pix2pix_model.py:206-210 + loss.py:136-156)."""
    assert produced.shape == target.shape
    return openeds_accuracy(to_255(produced), to_255(target))


def error_statistics(all_errors, mode: str, dataset_key: str) -> dict:
    """Relative (x1471) error dict (loss.py:158-174)."""
    all_errors = np.asarray(all_errors)
    relative = float(np.sum(all_errors) / len(all_errors) * RELATIVE_FACTOR)
    return {f"mse/{dataset_key}/{mode}/relative": relative}
