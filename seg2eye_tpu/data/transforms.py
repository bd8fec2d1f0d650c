"""Host-side transforms (numpy/cv2) applied at load time.

Parity notes (reference: data/base_dataset.py):
  * 'fixed' preprocess resizes every image to W=crop_size,
    H=round(crop_size/aspect_ratio) (base_dataset.py:67-70); bicubic for
    images, nearest for masks (openeds_dataset.py:91-104).
  * Random horizontal flip shared across mask/style/target of a sample via
    the params dict (base_dataset.py:40-47).
  * ToTensor+Normalize(0.5, 0.5): uint8 [0,255] -> float32 [-1,1]; masks stay
    uint8 class ids (openeds_dataset.py:93-97).

Only the load-time resize runs on host (uint8, cheap); everything downstream
(one-hot, 400x640 scoring resize) is in-graph.
"""
from __future__ import annotations

from typing import Dict

import cv2
import numpy as np


def get_params(opt, rng: np.random.Generator) -> Dict:
    """Per-sample transform params (base_dataset.py:25-47).  'fixed' mode has
    no crop; only the flip coin matters."""
    flip = False
    if not opt.no_flip and opt.isTrain:
        flip = bool(rng.random() > 0.5)
    return {"flip": flip}


def resize_fixed(img: np.ndarray, w: int, h: int, is_mask: bool) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_CUBIC
    return cv2.resize(img, (w, h), interpolation=interp)


def transform_image(img: np.ndarray, opt, params: Dict) -> np.ndarray:
    """uint8 (H,W) image -> float32 (h,w,1) in [-1,1]."""
    out = resize_fixed(img, opt.image_width, opt.image_height, is_mask=False)
    if params.get("flip"):
        out = out[:, ::-1]
    out = out.astype(np.float32) / 255.0
    out = (out - 0.5) / 0.5
    return out[..., None]


def transform_mask(mask: np.ndarray, opt, params: Dict) -> np.ndarray:
    """uint8 (H,W) class-id mask -> uint8 (h,w), nearest resize, no normalize."""
    out = resize_fixed(mask, opt.image_width, opt.image_height, is_mask=True)
    if params.get("flip"):
        out = out[:, ::-1]
    return np.ascontiguousarray(out)
