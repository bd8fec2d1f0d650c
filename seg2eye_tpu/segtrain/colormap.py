"""Segmentation label <-> color maps.

Parity notes (reference: refinenet/deeplab/dataloaders/utils.py):
  * pascal/coco share the 21-entry VOC palette (utils.py:91-101),
    cityscapes has its own 19-entry palette (utils.py:68-88).
  * decode_segmap returns float RGB in [0,1] (utils.py:40-48); labels
    outside [0, n_classes) — e.g. the 255 ignore index — map to black
    (the reference's per-class copy loop leaves them at their raw value
    scaled by /255; we zero them, the only sane rendering of "ignore").
  * encode_segmap maps a VOC-palette RGB image back to class indices
    (utils.py:51-65).

TPU-first: both directions are a single vectorized LUT gather / equality
reduction instead of the reference's per-class python loops.
"""
from __future__ import annotations

import numpy as np

PASCAL_LABELS = np.asarray(
    [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0],
     [0, 0, 128], [128, 0, 128], [0, 128, 128], [128, 128, 128],
     [64, 0, 0], [192, 0, 0], [64, 128, 0], [192, 128, 0],
     [64, 0, 128], [192, 0, 128], [64, 128, 128], [192, 128, 128],
     [0, 64, 0], [128, 64, 0], [0, 192, 0], [128, 192, 0],
     [0, 64, 128]], dtype=np.uint8)

CITYSCAPES_LABELS = np.asarray(
    [[128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
     [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
     [107, 142, 35], [152, 251, 152], [0, 130, 180], [220, 20, 60],
     [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
     [0, 0, 230], [119, 11, 32]], dtype=np.uint8)


def get_labels(dataset: str) -> np.ndarray:
    if dataset in ("pascal", "coco", "sbd"):
        return PASCAL_LABELS
    if dataset == "cityscapes":
        return CITYSCAPES_LABELS
    raise NotImplementedError(f"no palette for dataset '{dataset}'")


def decode_segmap(label_mask: np.ndarray, dataset: str = "pascal"
                  ) -> np.ndarray:
    """(..., H, W) int labels -> (..., H, W, 3) float RGB in [0,1]."""
    colors = get_labels(dataset)
    lab = np.asarray(label_mask).astype(np.int64)
    valid = (lab >= 0) & (lab < len(colors))
    rgb = colors[np.where(valid, lab, 0)].astype(np.float32) / 255.0
    return rgb * valid[..., None]


def decode_seg_map_batch(label_masks: np.ndarray, dataset: str = "pascal"
                         ) -> np.ndarray:
    """(N, H, W) -> (N, H, W, 3); NHWC (the torch original transposes to
    NCHW for make_grid, utils.py:10 — we stay NHWC)."""
    return decode_segmap(label_masks, dataset)


def encode_segmap(mask: np.ndarray) -> np.ndarray:
    """(H, W, 3) VOC-palette RGB -> (H, W) int class map (utils.py:51-65);
    non-palette colors map to 0 like the reference's zeros init."""
    mask = np.asarray(mask).astype(np.int64)
    eq = (mask[..., None, :] == PASCAL_LABELS[None, None]).all(-1)
    hit = eq.any(-1)
    return np.where(hit, eq.argmax(-1), 0).astype(np.int64)
