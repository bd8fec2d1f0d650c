"""Console/file/tensorboard observability.

Parity notes (reference: util/visualizer.py):
  * ``print_current_errors`` console format + ``loss_log.txt`` append
    (visualizer.py:85-95).
  * scalar/image logging gated on --tf_log (visualizer.py:30-36, 50-82) —
    backed here by tensorboardX.
  * ``visualize_sidebyside`` builds (style grid | mask | target | fake |
    error heatmap | text footer) panels (visualizer.py:131-166).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

try:
    import cv2
except Exception:                                  # pragma: no cover
    cv2 = None


def _to_img01(x: np.ndarray) -> np.ndarray:
    """[-1,1] or [0,255] or class-ids -> [0,1] grayscale HW array."""
    x = np.asarray(x, np.float32)
    x = np.squeeze(x)
    if x.max() <= 1.0 + 1e-6 and x.min() >= -1.0 - 1e-6:
        return (x + 1.0) / 2.0
    if x.max() < 4:          # label map (postprocessor.py:64-66)
        return x / 3.0
    return x / 255.0


def _resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    if cv2 is None or img.shape == (h, w):
        return img
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def _text_strip(text: str, w: int, h: int = 60) -> np.ndarray:
    """cv2.putText footer (util/image_annotate.py). OpenCV>=5 requires uint8."""
    strip = np.zeros((h, w), np.uint8)
    if cv2 is not None:
        cv2.putText(strip, text, (2, h - 10), cv2.FONT_HERSHEY_SIMPLEX,
                    0.35, 255, 1)
    return strip.astype(np.float32) / 255.0


def annotate_pupil(image01: np.ndarray, label: np.ndarray) -> np.ndarray:
    """Draw a crosshair at the pupil (class 3) centroid
    (reference: util/visualizer.py:169-186 annotate_pupil)."""
    img = np.ascontiguousarray(np.asarray(image01, np.float32))
    ys, xs = np.nonzero(np.squeeze(label) == 3)
    if len(ys) == 0 or cv2 is None:
        return img
    cy, cx = int(ys.mean()), int(xs.mean())
    u8 = (img * 255).astype(np.uint8)
    cv2.drawMarker(u8, (cx, cy), 255, markerType=cv2.MARKER_CROSS,
                   markerSize=9, thickness=1)
    return u8.astype(np.float32) / 255.0


def style_grid(style: np.ndarray, w: int, h: int, max_refs: int = 4
               ) -> np.ndarray:
    """<=4 style refs tiled in a 2x2 grid (visualizer.py:139-148)."""
    k = min(style.shape[0], max_refs)
    cells = [_resize(_to_img01(style[i]), w // 2, h // 2) for i in range(k)]
    while len(cells) < 4:
        cells.append(np.zeros((h // 2, w // 2), np.float32))
    top = np.concatenate(cells[:2], axis=1)
    bot = np.concatenate(cells[2:4], axis=1)
    return np.concatenate([top, bot], axis=0)


def visualize_sidebyside(data: Dict, w: int = 200, h: int = 320,
                         error_list: Optional[np.ndarray] = None) -> Dict:
    """Returns {key: (1,H,W) float [-1,1]} panels, one per sample."""
    visuals = {}
    n = len(data["fake"])
    for i in range(n):
        panels = [
            style_grid(np.asarray(data["style_image"][i]), w, h),
            _resize(_to_img01(np.asarray(data["label"][i])), w, h),
        ]
        if "target" in data:
            panels.append(_resize(_to_img01(np.asarray(data["target"][i])), w, h))
        fake = _resize(_to_img01(np.asarray(data["fake"][i])), w, h)
        panels.append(fake)
        if "target" in data:
            err = np.abs(fake - panels[2])
            err = err / max(err.max(), 1e-6)
            panels.append(err)
        row = np.concatenate(panels, axis=1)
        footer_txt = f"{data.get('user', ['?'] * n)[i]} {data.get('filename', ['?'] * n)[i]}"
        if error_list is not None:
            footer_txt += f" err={float(np.ravel(error_list)[i]):.4f}"
        footer = _text_strip(footer_txt, row.shape[1])
        panel = np.concatenate([row, footer], axis=0)
        key = f"{data.get('user', ['?'] * n)[i]}/{data.get('filename', ['?'] * n)[i]}"
        visuals[key] = (panel * 2.0 - 1.0)[None]
    return visuals


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.tf_log = getattr(opt, "tf_log", False)
        self.log_dir = os.path.join(opt.checkpoints_dir, opt.name, "logs")
        self.writer = None
        if self.tf_log:
            from tensorboardX import SummaryWriter
            os.makedirs(self.log_dir, exist_ok=True)
            self.writer = SummaryWriter(self.log_dir)
        if opt.isTrain:
            os.makedirs(opt.expr_dir, exist_ok=True)
            self.log_name = os.path.join(opt.expr_dir, "loss_log.txt")
            with open(self.log_name, "a") as f:
                f.write("================ Training Loss (%s) ================\n"
                        % time.strftime("%c"))
        else:
            self.log_name = None

    def print_current_errors(self, epoch, i, errors: Dict, t: float):
        message = "(epoch: %d, iters: %d, time: %.3f) " % (epoch, i, t)
        for k, v in errors.items():
            message += "%s: %.3f " % (k, float(np.mean(np.asarray(v))))
        print(message)
        if self.log_name:
            with open(self.log_name, "a") as f:
                f.write("%s\n" % message)

    def plot_current_errors(self, errors: Dict, step: int):
        if self.writer is not None:
            for k, v in errors.items():
                self.writer.add_scalar(k, float(np.mean(np.asarray(v))), step)

    def display_current_results(self, visuals: Dict, epoch, step):
        if self.writer is not None:
            for k, v in visuals.items():
                img01 = np.clip((np.asarray(v) + 1.0) / 2.0, 0, 1)
                self.writer.add_image(k.replace("/", "_"), img01, step)
