"""Host-side image pre/post-processing helpers (ImageProcessor /
ImagePreprocessor parity; reference: data/preprocessor.py + data/postprocessor.py).

The hot score path runs in-graph (ops/image.py); these numpy equivalents
cover the host-side API surface: range-sniffing normalize/unnormalize,
batch reshaping, histogram equalization, and error maps.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:                                   # pragma: no cover
    cv2 = None

EPS = 1e-6


def as_batch(image: np.ndarray) -> np.ndarray:
    """(H,W[,C]) -> (1,H,W,C); (B,H,W,C) passes through
    (postprocessor.py:15-24, NHWC here)."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[None, ..., None]
    elif image.ndim == 3:
        image = image[None]
    if image.ndim != 4:
        raise ValueError(f"Image has too many dimensions: {image.ndim}")
    return image


def unnormalize(image: np.ndarray) -> np.ndarray:
    """Range-sniffing conversion to [0,255] ints (postprocessor.py:56-72):
    [-1,1] -> (x+1)*255/2; label maps ([0,4)) -> /3*255; [0,255] unchanged.
    Truncates like torch's .int()."""
    image = np.asarray(image, np.float64)
    mn, mx = image.min(), image.max()
    if mn >= -1 - EPS and mx <= 1 + EPS:
        image = (image + 1.0) * 255.0 / 2.0
    elif mn >= 0 and mx < 4:
        image = image / 3.0 * 255.0
    elif mn >= 0 and mx <= 255:
        pass
    else:
        raise ValueError(f"Invalid ranges for image. Min: {mn}, max: {mx}")
    return np.trunc(image).astype(np.int32)


def normalize(image: np.ndarray) -> np.ndarray:
    """Range-sniffing [0,max] -> [-1,1] (postprocessor.py:75-89)."""
    image = np.asarray(image, np.float32)
    mn, mx = image.min(), image.max()
    if mn >= -1 - EPS and mx <= 1 + EPS:
        return image
    if mn >= 0:
        return image / max(mx, EPS) * 2.0 - 1.0
    raise ValueError(f"Invalid ranges for image. Min: {mn}, max: {mx}")


def equalize(image_u8: np.ndarray) -> np.ndarray:
    """Histogram equalization (preprocessor.py equalize; cv2.equalizeHist)."""
    if cv2 is None:
        return image_u8
    return cv2.equalizeHist(np.asarray(image_u8, np.uint8))


def get_error_map(fake: np.ndarray, target: np.ndarray) -> np.ndarray:
    """abs error rescaled to [-1,1] (postprocessor.py:124-130)."""
    assert fake.shape == target.shape
    err = np.abs(np.asarray(fake, np.float32) -
                 np.asarray(target, np.float32))
    return err / max(err.max(), EPS) * 2.0 - 1.0
