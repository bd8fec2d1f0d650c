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
                             num_classes: int) -> np.ndarray:
    z = np.zeros((num_classes,), np.float64)
    print("Calculating classes weights")
    for sample in dataloader:
        y = np.asarray(sample["label"])
        mask = (y >= 0) & (y < num_classes)
        z += np.bincount(y[mask].astype(np.int64), minlength=num_classes)
    total_frequency = z.sum()
    class_weights = 1.0 / np.log(1.02 + z / total_frequency)
    ret = class_weights.astype(np.float64)
    os.makedirs(db_root, exist_ok=True)
    np.save(os.path.join(db_root, dataset + "_classes_weights.npy"), ret)
    return ret
