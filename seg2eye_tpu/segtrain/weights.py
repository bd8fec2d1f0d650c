"""Class-balanced loss weights from the label histogram.

Parity (reference: refinenet/deeplab/utils/calculate_weights.py:6-29):
one pass over the train loader counting valid pixels per class, then
weight_c = 1 / ln(1.02 + freq_c/total), cached as
<db_root>/<dataset>_classes_weights.npy.
"""
from __future__ import annotations

import os

import numpy as np


def calculate_weights_labels(db_root: str, dataset: str, dataloader,
                             num_classes: int, save: bool = True
                             ) -> np.ndarray:
    """``dataloader`` must cover the FULL dataset (reference semantics) —
    under multi-process DP pass a non-process-sharded loader, not the
    training loader (which yields only this host's shard).  ``save=False``
    skips the cache write (non-primary hosts — N hosts racing np.save on a
    shared filesystem would tear the file)."""
    z = np.zeros((num_classes,), np.float64)
    print("Calculating classes weights")
    for sample in dataloader:
        y = np.asarray(sample["label"])
        mask = (y >= 0) & (y < num_classes)
        z += np.bincount(y[mask].astype(np.int64), minlength=num_classes)
    total_frequency = z.sum()
    class_weights = 1.0 / np.log(1.02 + z / total_frequency)
    ret = class_weights.astype(np.float64)
    if save:
        os.makedirs(db_root, exist_ok=True)
        path = os.path.join(db_root, dataset + "_classes_weights.npy")
        tmp = path + ".tmp.npy"          # .npy suffix: np.save won't append
        np.save(tmp, ret)
        os.replace(tmp, path)
    return ret
