"""Host-side PIL/numpy transforms for the generic segmentation trainer.

Parity notes (reference: refinenet/deeplab/dataloaders/custom_transforms.py):
  * RandomHorizontalFlip p=0.5 (custom_transforms.py:49-58)
  * RandomScaleCrop: short edge resized to randint[0.5*base, 2*base]
    (inclusive), pad right/bottom to crop_size (mask pad = ``fill``, 255 for
    cityscapes), then random crop (custom_transforms.py:88-122)
  * RandomGaussianBlur p=0.5, radius ~ U[0,1) (custom_transforms.py:76-85)
  * RandomRotate uniform(-deg, deg), bilinear img / nearest mask
    (custom_transforms.py:61-73)
  * FixScaleCrop: short edge -> crop_size then center crop
    (custom_transforms.py:125-149)
  * FixedResize to (size, size) (custom_transforms.py:151-165)
  * Normalize: /255, -mean, /std (custom_transforms.py:7-27)

Deviations (TPU-native by design):
  * randomness comes from an explicit ``np.random.Generator`` threaded by the
    data loader instead of the global ``random`` module (reproducible,
    thread-safe under the prefetch worker);
  * the terminal transform keeps images NHWC float32 (the torch ToTensor
    CHW transpose, custom_transforms.py:30-46, has no place on TPU).

Each transform is ``f(sample: dict, rng) -> dict`` over PIL images; compose()
threads one rng through the chain.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageFilter, ImageOps

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def compose(transforms: List[Callable]) -> Callable:
    def run(sample: Dict, rng: Optional[np.random.Generator] = None) -> Dict:
        rng = rng if rng is not None else np.random.default_rng()
        for t in transforms:
            sample = t(sample, rng)
        return sample
    return run


def random_horizontal_flip(sample: Dict, rng) -> Dict:
    if rng.random() < 0.5:
        return {"image": sample["image"].transpose(Image.FLIP_LEFT_RIGHT),
                "label": sample["label"].transpose(Image.FLIP_LEFT_RIGHT)}
    return sample


def random_rotate(degree: float) -> Callable:
    def t(sample: Dict, rng) -> Dict:
        deg = rng.uniform(-degree, degree)
        return {"image": sample["image"].rotate(deg, Image.BILINEAR),
                "label": sample["label"].rotate(deg, Image.NEAREST)}
    return t


def random_gaussian_blur(sample: Dict, rng) -> Dict:
    img = sample["image"]
    if rng.random() < 0.5:
        img = img.filter(ImageFilter.GaussianBlur(radius=rng.random()))
    return {"image": img, "label": sample["label"]}


def random_scale_crop(base_size: int, crop_size: int, fill: int = 0
                      ) -> Callable:
    def t(sample: Dict, rng) -> Dict:
        img, mask = sample["image"], sample["label"]
        # random.randint is INCLUSIVE on both ends (custom_transforms.py:98)
        short_size = int(rng.integers(int(base_size * 0.5),
                                      int(base_size * 2.0) + 1))
        w, h = img.size
        if h > w:
            ow = short_size
            oh = int(1.0 * h * ow / w)
        else:
            oh = short_size
            ow = int(1.0 * w * oh / h)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        if short_size < crop_size:
            padh = crop_size - oh if oh < crop_size else 0
            padw = crop_size - ow if ow < crop_size else 0
            img = ImageOps.expand(img, border=(0, 0, padw, padh), fill=0)
            mask = ImageOps.expand(mask, border=(0, 0, padw, padh),
                                   fill=fill)
        w, h = img.size
        x1 = int(rng.integers(0, w - crop_size + 1))
        y1 = int(rng.integers(0, h - crop_size + 1))
        img = img.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        mask = mask.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        return {"image": img, "label": mask}
    return t


def fix_scale_crop(crop_size: int) -> Callable:
    def t(sample: Dict, rng) -> Dict:
        img, mask = sample["image"], sample["label"]
        w, h = img.size
        if w > h:
            oh = crop_size
            ow = int(1.0 * w * oh / h)
        else:
            ow = crop_size
            oh = int(1.0 * h * ow / w)
        img = img.resize((ow, oh), Image.BILINEAR)
        mask = mask.resize((ow, oh), Image.NEAREST)
        w, h = img.size
        x1 = int(round((w - crop_size) / 2.0))
        y1 = int(round((h - crop_size) / 2.0))
        img = img.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        mask = mask.crop((x1, y1, x1 + crop_size, y1 + crop_size))
        return {"image": img, "label": mask}
    return t


def fixed_resize(size: int) -> Callable:
    def t(sample: Dict, rng) -> Dict:
        img, mask = sample["image"], sample["label"]
        assert img.size == mask.size
        return {"image": img.resize((size, size), Image.BILINEAR),
                "label": mask.resize((size, size), Image.NEAREST)}
    return t


def normalize_to_arrays(mean: Tuple[float, ...] = IMAGENET_MEAN,
                        std: Tuple[float, ...] = IMAGENET_STD) -> Callable:
    """Terminal transform: PIL -> {'image': HWC f32 normalized,
    'label': HW f32} (Normalize + the layout-only part of ToTensor)."""
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    def t(sample: Dict, rng) -> Dict:
        img = np.asarray(sample["image"], dtype=np.float32) / 255.0
        img = (img - mean_a) / std_a
        mask = np.asarray(sample["label"], dtype=np.float32)
        return {"image": img, "label": mask}
    return t


def train_transform(base_size: int, crop_size: int, fill: int = 0) -> Callable:
    """The shared train-split chain (pascal.py:84-92, cityscapes.py:81-89,
    coco.py:97-105, sbd.py:79-87)."""
    return compose([random_horizontal_flip,
                    random_scale_crop(base_size, crop_size, fill=fill),
                    random_gaussian_blur,
                    normalize_to_arrays()])


def val_transform(crop_size: int) -> Callable:
    """Shared val-split chain (pascal.py:94-101 etc.)."""
    return compose([fix_scale_crop(crop_size), normalize_to_arrays()])


def test_transform(crop_size: int) -> Callable:
    """Cityscapes test-split chain (cityscapes.py:100-107)."""
    return compose([fixed_resize(crop_size), normalize_to_arrays()])
