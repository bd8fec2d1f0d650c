"""Confusion-matrix evaluator (pixel acc / class acc / mIoU / fwIoU).

Parity notes (reference: refinenet/deeplab/utils/metrics.py):
  * matrix rows = ground truth, cols = prediction; pixels with
    gt outside [0, num_class) (the 255 ignore index) are dropped
    (metrics.py:34-39);
  * Pixel_Accuracy = trace/sum; Pixel_Accuracy_Class = nanmean of per-class
    recall (0-pixel classes excluded via nan); mIoU = nanmean of IoU;
    FWIoU sums freq-weighted IoU over classes with freq > 0
    (metrics.py:9-32).

TPU-first: the per-batch matrix is ONE jitted scatter-add over
``num_class*gt + pred`` (the reference's np.bincount, in-graph), so eval
batches never leave the device until the final (num_class², f32) pull;
cross-batch accumulation is float64 on host for exact counts at any
dataset size.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=2)
def confusion_matrix(gt: jnp.ndarray, pred: jnp.ndarray, num_class: int
                     ) -> jnp.ndarray:
    """(...,) int gt/pred -> (num_class, num_class) f32 counts
    (metrics.py:34-39 _generate_matrix)."""
    gt = gt.astype(jnp.int32).ravel()
    pred = pred.astype(jnp.int32).ravel()
    mask = (gt >= 0) & (gt < num_class)
    idx = jnp.where(mask, num_class * gt + pred, 0)
    # int32 counts: exact up to 2^31 pixels/cell per batch (f32 would stop
    # incrementing at 2^24 — reachable for background-dominated big batches)
    counts = jnp.zeros(num_class * num_class, jnp.int32)
    counts = counts.at[idx].add(mask.astype(jnp.int32))
    return counts.reshape(num_class, num_class)


class Evaluator:
    def __init__(self, num_class: int):
        self.num_class = num_class
        self.confusion = np.zeros((num_class, num_class), np.float64)

    def reset(self) -> None:
        self.confusion = np.zeros((self.num_class,) * 2, np.float64)

    def add_batch(self, gt, pred) -> None:
        assert np.shape(gt) == np.shape(pred), (np.shape(gt), np.shape(pred))
        self.add_matrix(confusion_matrix(jnp.asarray(gt), jnp.asarray(pred),
                                         self.num_class))

    def add_matrix(self, matrix) -> None:
        """Accumulate a precomputed (num_class², ) device matrix — lets the
        eval step fuse forward+argmax+matrix into one XLA program."""
        self.confusion += np.asarray(jax.device_get(matrix), np.float64)

    # ------------------------------------------------------------------ #
    def pixel_accuracy(self) -> float:
        return float(np.diag(self.confusion).sum() / self.confusion.sum())

    def pixel_accuracy_class(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(self.confusion) / self.confusion.sum(axis=1)
        return float(np.nanmean(acc))

    def mean_intersection_over_union(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.diag(self.confusion) / (
                self.confusion.sum(axis=1) + self.confusion.sum(axis=0)
                - np.diag(self.confusion))
        return float(np.nanmean(iou))

    def frequency_weighted_intersection_over_union(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            freq = self.confusion.sum(axis=1) / self.confusion.sum()
            iou = np.diag(self.confusion) / (
                self.confusion.sum(axis=1) + self.confusion.sum(axis=0)
                - np.diag(self.confusion))
        return float((freq[freq > 0] * iou[freq > 0]).sum())

    # reference method names (metrics.py:9-32), for drop-in callers
    Pixel_Accuracy = pixel_accuracy
    Pixel_Accuracy_Class = pixel_accuracy_class
    Mean_Intersection_over_Union = mean_intersection_over_union
    Frequency_Weighted_Intersection_over_Union = \
        frequency_weighted_intersection_over_union
