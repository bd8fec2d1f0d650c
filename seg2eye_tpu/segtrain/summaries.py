"""Tensorboard image panels for the generic segmentation trainer.

Parity notes (reference: refinenet/deeplab/utils/summaries.py):
  * visualize_image logs three 3-wide grids at each call: the (min-max
    normalized) input images, the decoded argmax predictions, and the
    decoded groundtruth (summaries.py:15-23, make_grid normalize=True for
    the image row).
  * Images arrive NHWC (our layout); the writer receives CHW arrays like
    tensorboardX expects.
"""
from __future__ import annotations

import numpy as np

from seg2eye_tpu.refinenet.loggers import Tensorboard
from seg2eye_tpu.segtrain.colormap import decode_seg_map_batch


def _grid(images_nhwc: np.ndarray, normalize: bool = False) -> np.ndarray:
    """First <=3 images side by side -> (C, H, W·n); min-max normalized
    jointly when ``normalize`` (torchvision make_grid semantics)."""
    imgs = np.asarray(images_nhwc[:3], np.float32)
    if normalize:
        lo, hi = imgs.min(), imgs.max()
        imgs = (imgs - lo) / max(hi - lo, 1e-5)
    row = np.concatenate(list(imgs), axis=1)        # (H, W·n, C)
    return np.clip(row, 0.0, 1.0).transpose(2, 0, 1)


class TensorboardSummary:
    def __init__(self, directory: str):
        self.directory = directory

    def create_summary(self) -> Tensorboard:
        return Tensorboard(self.directory)

    def visualize_image(self, writer: Tensorboard, dataset: str,
                        image: np.ndarray, target: np.ndarray,
                        output: np.ndarray, global_step: int) -> None:
        """image (N,H,W,3) normalized; target (N,H,W) labels;
        output (N,H,W,C) logits."""
        writer.update_current_step(global_step)
        writer.add_image("Image", _grid(np.asarray(image), normalize=True))
        pred = np.argmax(np.asarray(output)[:3], axis=-1)
        writer.add_image("Predicted label",
                         _grid(decode_seg_map_batch(pred, dataset)))
        gt = decode_seg_map_batch(np.asarray(target)[:3], dataset)
        writer.add_image("Groundtruth label", _grid(gt))
