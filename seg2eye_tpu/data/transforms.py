"""Host-side transforms (numpy/cv2) applied at load time.

Parity notes (reference: data/base_dataset.py):
  * preprocess modes (base_dataset.py:50-80): resize_and_crop, crop,
    scale_width(_and_crop), scale_shortside(_and_crop), fixed, none.
    'fixed' (the OpenEDS default) resizes to W=crop_size,
    H=round(crop_size/aspect_ratio) (base_dataset.py:67-70); 'none' rounds
    to a multiple of 32 (base_dataset.py:63-65).
  * get_params draws the shared crop position and flip coin
    (base_dataset.py:25-47).
  * bicubic for images, nearest for masks (openeds_dataset.py:91-104).
  * ToTensor+Normalize(0.5, 0.5): uint8 [0,255] -> float32 [-1,1]; masks stay
    uint8 class ids (openeds_dataset.py:93-97).

Only the load-time resize runs on host (uint8, cheap); everything downstream
(one-hot, 400x640 scoring resize) is in-graph.
"""
from __future__ import annotations

import collections
import threading
from typing import Callable, Dict, Hashable

import cv2
import numpy as np
from PIL import Image


class ResizeCache:
    """Byte-capped LRU cache of deterministic host-side work (H5 read +
    resize), keyed by (user, dataset key, index).

    Semantics-neutral: the cached value is the *pre-flip, pre-normalize*
    resized uint8 image, and in 'fixed' mode the resize target is constant
    for the run — so cached and uncached paths are bit-identical
    (tests/test_data.py::test_resize_cache_identical).  Exists because TPU
    training is host-input-bound on small hosts: the reference's answer was
    8 DataLoader worker processes (options/base_options.py:51), ours is
    thread prefetch + not redoing identical bicubic resizes every epoch.
    """

    def __init__(self, limit_mb: int):
        self.limit = int(limit_mb) << 20
        self.size = 0
        self._d: "collections.OrderedDict[Hashable, np.ndarray]" = \
            collections.OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key: Hashable, produce: Callable[[], np.ndarray]
            ) -> np.ndarray:
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self.hits += 1
                self._d.move_to_end(key)
                return v
            self.misses += 1
        v = produce()                  # produce outside the lock (slow I/O)
        with self._lock:
            racer = self._d.get(key)
            if racer is not None:      # another thread inserted meanwhile;
                self._d.move_to_end(key)  # keep theirs, don't double-count
                return racer
            self._d[key] = v
            self.size += v.nbytes
            while self.size > self.limit and self._d:
                _, old = self._d.popitem(last=False)
                self.size -= old.nbytes
        return v


def get_params(opt, rng: np.random.Generator,
               size: tuple = None) -> Dict:
    """Per-sample transform params (base_dataset.py:25-47). ``size`` is the
    source (w, h) — needed by the *_and_crop modes."""
    w, h = size if size is not None else (opt.image_width, opt.image_height)
    new_w, new_h = w, h
    mode = opt.preprocess_mode
    if mode == "resize_and_crop":
        new_w = new_h = opt.load_size
    elif mode == "scale_width_and_crop":
        new_w = opt.load_size
        new_h = opt.load_size * h // w
    elif mode == "scale_shortside_and_crop":
        ss, ls = min(w, h), max(w, h)
        width_is_shorter = w == ss
        ls = int(opt.load_size * ls / ss)
        new_w, new_h = (ss, ls) if width_is_shorter else (ls, ss)

    x = int(rng.integers(0, max(0, new_w - opt.crop_size) + 1))
    y = int(rng.integers(0, max(0, new_h - opt.crop_size) + 1))
    flip = False
    if not opt.no_flip and opt.isTrain:
        flip = bool(rng.random() > 0.5)
    return {"crop_pos": (x, y), "flip": flip}


def _resize(img: np.ndarray, w: int, h: int, is_mask: bool) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    if is_mask:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    # the reference feeds PIL Images, so Image.resize(BICUBIC) ANTIALIASES
    # the 640x400 -> 320x256 downscale (base_dataset.py:105 transforms.resize
    # with Image.BICUBIC); cv2.INTER_CUBIC does not — per-pixel differences
    # up to ~137/255.  Masks stay cv2 nearest (the reference passes ndarrays
    # on that path, openeds_dataset.py:89-94).
    if img.ndim == 2:
        return np.asarray(Image.fromarray(img).resize((w, h), Image.BICUBIC))
    return np.stack(
        [np.asarray(Image.fromarray(img[..., c]).resize((w, h),
                                                        Image.BICUBIC))
         for c in range(img.shape[-1])], axis=-1)


# kept for back-compat with earlier call sites
def resize_fixed(img: np.ndarray, w: int, h: int,
                 is_mask: bool) -> np.ndarray:
    return _resize(img, w, h, is_mask)


def resize_for_fixed(img: np.ndarray, opt) -> np.ndarray:
    """The 'fixed'-mode image resize (W=crop, H=crop/aspect) — the unit the
    ResizeCache stores (pre-flip, pre-normalize uint8)."""
    return _resize(img, opt.image_width, opt.image_height, False)


def finish_image(resized: np.ndarray, params: Dict) -> np.ndarray:
    """flip + ToTensor/Normalize tail of transform_image, applied to an
    (already resized) uint8 image."""
    out = resized[:, ::-1] if params.get("flip") else resized
    out = out.astype(np.float32) / 255.0
    out = (out - 0.5) / 0.5
    return np.ascontiguousarray(out)[..., None]


def finish_image_u8(resized: np.ndarray, params: Dict) -> np.ndarray:
    """flip only — uint8 device-transport path (opt.device_normalize): the
    Normalize(0.5,0.5) runs in-graph (models/pix2pix.py preprocess) with the
    exact host formula, so results are bit-identical while host->device
    transfer shrinks 4x (f32 -> uint8)."""
    out = resized[:, ::-1] if params.get("flip") else resized
    return np.ascontiguousarray(out)[..., None]


def spatial_image(img: np.ndarray, opt, params: Dict) -> np.ndarray:
    """Public spatial transform for images (resize/crop/flip, uint8 out) —
    the device-transport path applies normalization in-graph instead."""
    return _apply_spatial(img, opt, params, is_mask=False)


def _apply_spatial(img: np.ndarray, opt, params: Dict,
                   is_mask: bool) -> np.ndarray:
    """The spatial part of get_transform (base_dataset.py:50-80)."""
    mode = opt.preprocess_mode
    h, w = img.shape[:2]
    if "resize" in mode:
        img = _resize(img, opt.load_size, opt.load_size, is_mask)
    elif "scale_width" in mode:
        if w != opt.load_size:
            img = _resize(img, opt.load_size, opt.load_size * h // w, is_mask)
    elif "scale_shortside" in mode:
        ss, ls = min(w, h), max(w, h)
        if ss != opt.load_size:
            ls = int(opt.load_size * ls / ss)
            nw, nh = (opt.load_size, ls) if w == ss else (ls, opt.load_size)
            img = _resize(img, nw, nh, is_mask)

    if "crop" in mode:
        x, y = params.get("crop_pos", (0, 0))
        # clamp into range: the reference's crop domain is computed from a
        # (w,h)-SWAPPED source size (see get_params' caller note), so the
        # position can exceed the resized extent for some aspect ratios —
        # PIL's img.crop pads silently there; we prefer an in-bounds
        # full-content crop, and zero-pad (PIL's black) only when the
        # extent itself is smaller than crop_size (static output shapes)
        y = min(y, max(0, img.shape[0] - opt.crop_size))
        x = min(x, max(0, img.shape[1] - opt.crop_size))
        img = img[y:y + opt.crop_size, x:x + opt.crop_size]
        ph = opt.crop_size - img.shape[0]
        pw = opt.crop_size - img.shape[1]
        if ph > 0 or pw > 0:
            pad = [(0, max(0, ph)), (0, max(0, pw))]
            pad += [(0, 0)] * (img.ndim - 2)
            img = np.pad(img, pad)

    if mode == "none":
        base = 32
        nh = int(round(img.shape[0] / base) * base)
        nw = int(round(img.shape[1] / base) * base)
        if (nh, nw) != img.shape[:2]:
            img = _resize(img, nw, nh, is_mask)

    if mode == "fixed":
        img = _resize(img, opt.image_width, opt.image_height, is_mask)

    if params.get("flip"):
        img = img[:, ::-1]
    return img


def transform_image(img: np.ndarray, opt, params: Dict) -> np.ndarray:
    """uint8 (H,W) image -> float32 (h,w,1) in [-1,1]."""
    out = _apply_spatial(img, opt, params, is_mask=False)
    out = out.astype(np.float32) / 255.0
    out = (out - 0.5) / 0.5
    return np.ascontiguousarray(out)[..., None]


def assemble_u8(resized, flip: bool) -> np.ndarray:
    """n resized uint8 (H,W) images -> (n,h,w,1) uint8 with shared flip —
    the device-transport companion of native.assemble_images."""
    if flip:
        resized = [im[:, ::-1] for im in resized]
    return np.ascontiguousarray(np.stack(resized))[..., None]


def transform_images_batch(imgs, opt, params: Dict) -> np.ndarray:
    """n uint8 (H,W) images -> (n,h,w,1) float32 [-1,1] (or uint8 with
    opt.device_normalize).  On the hot 'fixed' path the normalize+flip+stack
    runs in one native pass (seg2eye_tpu.native); other modes fall back to
    per-image transforms."""
    if opt.preprocess_mode == "fixed" and imgs[0].dtype == np.uint8:
        resized = [_resize(im, opt.image_width, opt.image_height, False)
                   for im in imgs]
        if getattr(opt, "device_normalize", False):
            return assemble_u8(resized, bool(params.get("flip")))
        from seg2eye_tpu import native
        return native.assemble_images(
            resized, [bool(params.get("flip"))] * len(imgs))
    if getattr(opt, "device_normalize", False) and imgs[0].dtype == np.uint8:
        # non-fixed modes: spatial transform only, stay uint8
        return np.ascontiguousarray(np.stack(
            [spatial_image(im, opt, params) for im in imgs]))[..., None]
    # non-uint8 sources can't ride the uint8 device-transport path (the
    # in-graph normalize triggers on dtype); do the full host normalize.
    return np.stack([transform_image(im, opt, params) for im in imgs])


def transform_mask(mask: np.ndarray, opt, params: Dict) -> np.ndarray:
    """uint8 (H,W) class-id mask -> uint8 (h,w), nearest resize, no normalize."""
    out = _apply_spatial(mask, opt, params, is_mask=True)
    return np.ascontiguousarray(out)
