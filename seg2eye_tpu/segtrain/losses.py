"""Segmentation losses, pure-jnp (NHWC logits).

Parity notes (reference: refinenet/deeplab/utils/loss.py):
  * CE = torch nn.CrossEntropyLoss(weight, ignore_index=255,
    size_average=True) semantics: per-pixel NLL weighted by the target
    class's weight, averaged over non-ignored pixels with the WEIGHTED
    denominator (sum of their class weights), then divided AGAIN by the
    batch size when batch_average (loss.py:21-33).
  * Focal applies the focal transform to the already-aggregated scalar CE
    (a reference quirk — NOT per-pixel): logpt = -ce; pt = e^logpt;
    logpt *= alpha; loss = -((1-pt)^gamma)·logpt; / n (loss.py:35-51).
  * build_loss('ce'|'focal'), anything else raises (loss.py:12-19).

TPU-first: one fused gather + masked reduction; jit-able, grad-able, and
shardable — under a data-sharded batch the sums lower to psum.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


class SegmentationLosses:
    def __init__(self, weight: Optional[jnp.ndarray] = None,
                 size_average: bool = True, batch_average: bool = True,
                 ignore_index: int = 255):
        self.ignore_index = ignore_index
        self.weight = None if weight is None else jnp.asarray(
            weight, jnp.float32)
        self.size_average = size_average
        self.batch_average = batch_average

    def build_loss(self, mode: str = "ce") -> Callable:
        """Choices: ['ce' or 'focal'] (loss.py:12-19)."""
        if mode == "ce":
            return self.cross_entropy
        if mode == "focal":
            return self.focal
        raise NotImplementedError(mode)

    def _aggregate_ce(self, logit: jnp.ndarray, target: jnp.ndarray
                      ) -> jnp.ndarray:
        """nn.CrossEntropyLoss(...) applied to (N,H,W,C) logits / (N,H,W)
        targets — the scalar BEFORE the batch_average division."""
        nc = logit.shape[-1]
        t = target.astype(jnp.int32)
        valid = (t != self.ignore_index) & (t >= 0) & (t < nc)
        tc = jnp.clip(t, 0, nc - 1)
        logp = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
        # one-hot contraction, NOT take_along_axis: per-pixel gathers lower
        # to scalar loops on TPU (measured 42 ms extra per SegNet eval step
        # at 8x640x400), while iota==label fuses into the reduction
        oh = jax.nn.one_hot(tc, nc, dtype=logp.dtype)
        nll = -jnp.sum(logp * oh, axis=-1)
        w = jnp.where(valid, 1.0, 0.0) if self.weight is None \
            else (oh @ self.weight) * valid
        total = jnp.sum(nll * w)
        if self.size_average:
            return total / jnp.maximum(jnp.sum(w), 1e-12)
        return total

    def cross_entropy(self, logit: jnp.ndarray, target: jnp.ndarray
                      ) -> jnp.ndarray:
        loss = self._aggregate_ce(logit, target)
        if self.batch_average:
            loss = loss / logit.shape[0]
        return loss

    def focal(self, logit: jnp.ndarray, target: jnp.ndarray,
              gamma: float = 2.0, alpha: Optional[float] = 0.5
              ) -> jnp.ndarray:
        logpt = -self._aggregate_ce(logit, target)
        pt = jnp.exp(logpt)
        if alpha is not None:
            logpt = logpt * alpha
        loss = -((1 - pt) ** gamma) * logpt
        if self.batch_average:
            loss = loss / logit.shape[0]
        return loss
