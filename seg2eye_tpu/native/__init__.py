"""Native (C++) host-runtime helpers with graceful Python fallback.

``assemble_images(images, flips)`` fuses uint8->[-1,1] float conversion,
optional horizontal flip, and batch stacking in one native pass (the hot
per-sample inner loop of the input pipeline).  Compiled on first use with
g++ (cached next to the package); falls back to numpy when no toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "fastbatch.cc")
    out = os.path.join(os.path.dirname(__file__), "_fastbatch.so")
    try:
        if not os.path.exists(out) or \
                os.path.getmtime(out) < os.path.getmtime(src):
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "_fastbatch.so")
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     src, "-o", tmp],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        for name in ("assemble_images", "assemble_masks"):
            fn = getattr(lib, name)
            fn.restype = None
        return lib
    except Exception:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build_and_load()
        _TRIED = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _ptr_array(arrs: Sequence[np.ndarray]):
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * len(arrs))()
    for i, a in enumerate(arrs):
        ptrs[i] = a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return ptrs


def assemble_images(images: List[np.ndarray],
                    flips: Optional[Sequence[bool]] = None) -> np.ndarray:
    """n uint8 (H,W) images -> (n,H,W,1) float32 in [-1,1], per-image flip."""
    n = len(images)
    h, w = images[0].shape
    flips_u8 = np.asarray(flips if flips is not None else [0] * n,
                          dtype=np.uint8)
    lib = _lib()
    if lib is not None:
        images = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
        dst = np.empty((n, h, w, 1), np.float32)
        lib.assemble_images(
            _ptr_array(images),
            flips_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int64(h), ctypes.c_int64(w),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return dst
    # numpy fallback
    out = np.empty((n, h, w, 1), np.float32)
    for i, im in enumerate(images):
        x = im[:, ::-1] if flips_u8[i] else im
        out[i, ..., 0] = x.astype(np.float32) / 127.5 - 1.0
    return out


def assemble_masks(masks: List[np.ndarray],
                   flips: Optional[Sequence[bool]] = None) -> np.ndarray:
    """n uint8 (H,W) class-id masks -> (n,H,W) uint8, per-mask flip."""
    n = len(masks)
    h, w = masks[0].shape
    flips_u8 = np.asarray(flips if flips is not None else [0] * n,
                          dtype=np.uint8)
    lib = _lib()
    if lib is not None:
        masks = [np.ascontiguousarray(m, dtype=np.uint8) for m in masks]
        dst = np.empty((n, h, w), np.uint8)
        lib.assemble_masks(
            _ptr_array(masks),
            flips_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int64(h), ctypes.c_int64(w),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return dst
    out = np.empty((n, h, w), np.uint8)
    for i, m in enumerate(masks):
        out[i] = m[:, ::-1] if flips_u8[i] else m
    return out
