"""Native (C++) batch assembly: builds with g++, matches the numpy fallback,
and actually speeds up the hot loop."""
import time

import numpy as np
import pytest

from seg2eye_tpu import native


def _images(n=6, h=64, w=40, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]


def test_native_builds():
    assert native.native_available(), \
        "g++ toolchain present in this image; the extension must build"


def test_assemble_images_matches_fallback():
    imgs = _images()
    flips = [True, False, True, False, False, True]
    got = native.assemble_images(imgs, flips)
    # fallback reference
    exp = np.empty((6, 64, 40, 1), np.float32)
    for i, im in enumerate(imgs):
        x = im[:, ::-1] if flips[i] else im
        exp[i, ..., 0] = x.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-6)
    assert got.dtype == np.float32


def test_assemble_masks_matches_fallback():
    masks = [(m % 4).astype(np.uint8) for m in _images(4)]
    flips = [False, True, False, True]
    got = native.assemble_masks(masks, flips)
    exp = np.stack([m[:, ::-1] if f else m for m, f in zip(masks, flips)])
    np.testing.assert_array_equal(got, exp)


def test_matches_reference_normalization():
    """(x/255 - 0.5)/0.5 == x/127.5 - 1 exactly for uint8 inputs."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    got = native.assemble_images([img])[0, ..., 0]
    exp = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(got, exp, atol=2e-7)


@pytest.mark.skipif(not native.native_available(), reason="no toolchain")
def test_native_is_faster_at_scale():
    imgs = [np.random.default_rng(i).integers(0, 256, (640, 400),
                                              dtype=np.uint8)
            for i in range(8)]
    native.assemble_images(imgs)                 # warm the lib

    t0 = time.perf_counter()
    for _ in range(10):
        native.assemble_images(imgs, [True] * 8)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(10):
        out = np.empty((8, 640, 400, 1), np.float32)
        for i, im in enumerate(imgs):
            out[i, ..., 0] = im[:, ::-1].astype(np.float32) / 127.5 - 1.0
    t_numpy = time.perf_counter() - t0
    # informational: assert it's at least not slower by 2x (CI jitter safe)
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)
    print(f"native {t_native * 100:.1f}ms vs numpy {t_numpy * 100:.1f}ms /10it")
