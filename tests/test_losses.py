"""Loss/metric parity tests vs hand-computed values and torch formulas."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from seg2eye_tpu.ops import image as I
from seg2eye_tpu.ops import losses as L
from seg2eye_tpu.ops import metrics as M


def rnd(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


# ------------------------------ GAN loss ------------------------------ #
def test_hinge_loss_values():
    x = rnd((2, 5, 5, 1))
    # discriminator real: -mean(min(x-1, 0))
    expect = -np.minimum(x - 1, 0).mean()
    got = L.gan_loss(jnp.asarray(x), True, True, "hinge")
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # discriminator fake: -mean(min(-x-1, 0))
    expect = -np.minimum(-x - 1, 0).mean()
    got = L.gan_loss(jnp.asarray(x), False, True, "hinge")
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # generator: -mean(x)
    got = L.gan_loss(jnp.asarray(x), True, False, "hinge")
    np.testing.assert_allclose(got, -x.mean(), rtol=1e-6)


def test_original_matches_torch_bce():
    x = rnd((3, 4), seed=1)
    tx = torch.from_numpy(x)
    expect = F.binary_cross_entropy_with_logits(tx, torch.ones_like(tx)).item()
    got = float(L.gan_loss(jnp.asarray(x), True, True, "original"))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_ls_and_w_modes():
    x = rnd((3, 4), seed=2)
    np.testing.assert_allclose(
        float(L.gan_loss(jnp.asarray(x), True, True, "ls")),
        ((x - 1) ** 2).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.gan_loss(jnp.asarray(x), False, True, "w")), x.mean(),
        rtol=1e-5)


def test_multiscale_averaging():
    """List-of-list predictions: average of per-scale losses over num scales
    (loss.py:85-99), using only the last (logit) tensor of each scale."""
    a = rnd((2, 3, 3, 1), 3)
    b = rnd((2, 2, 2, 1), 4)
    preds = [[rnd((2, 8, 8, 4), 5), jnp.asarray(a)],
             [rnd((2, 4, 4, 4), 6), jnp.asarray(b)]]
    got = float(L.gan_loss(preds, True, False, "hinge"))
    expect = (-a.mean() + -b.mean()) / 2
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_feature_matching():
    pf = [[jnp.asarray(rnd((2, 4, 4, 3), s)) for s in (1, 2)],
          [jnp.asarray(rnd((2, 2, 2, 3), s)) for s in (3, 4)]]
    pr = [[jnp.asarray(rnd((2, 4, 4, 3), s)) for s in (5, 6)],
          [jnp.asarray(rnd((2, 2, 2, 3), s)) for s in (7, 8)]]
    lam = 10.0
    got = float(L.feature_matching_loss(pf, pr, lam))
    expect = 0.0
    for i in range(2):
        # excludes the last (logits) entry of each scale
        expect += np.abs(np.asarray(pf[i][0]) - np.asarray(pr[i][0])).mean() * lam / 2
    np.testing.assert_allclose(got, expect, rtol=1e-5)


# ------------------------------ gram/style ------------------------------ #
def test_gram_matches_torch():
    feat = rnd((2, 4, 5, 3), 7)          # NHWC
    tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    a, b, c, d = tfeat.shape
    tf = tfeat.reshape(a * b, c * d)
    expect = (tf @ tf.t() / (a * b * c * d)).numpy()
    got = np.asarray(L.gram_matrix(jnp.asarray(feat)))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=5e-4)


# ------------------------------ metric ------------------------------ #
def test_openeds_accuracy_hand_value():
    p = np.zeros((1, 4, 5, 1), np.float32)
    t = np.full((1, 4, 5, 1), 2.0, np.float32)
    # sqrt(20 * 4) / 20 = sqrt(80)/20
    got = float(M.openeds_accuracy(jnp.asarray(p), jnp.asarray(t))[0])
    np.testing.assert_allclose(got, np.sqrt(80.0) / 20, rtol=1e-6)


def test_mse_for_tensors_truncation():
    """[-1,1] path converts via truncating to_255 (postprocessor .int())."""
    p = np.full((1, 2, 2, 1), 0.5, np.float32)
    t = np.full((1, 2, 2, 1), -0.5, np.float32)
    # to_255: trunc(1.5*127.5)=191, trunc(0.5*127.5)=63 -> diff 128
    got = float(M.mse_for_tensors(jnp.asarray(p), jnp.asarray(t))[0])
    np.testing.assert_allclose(got, np.sqrt(4 * 128.0 ** 2) / 4, rtol=1e-6)


def test_error_statistics():
    errs = [1.0, 2.0, 3.0]
    d = M.error_statistics(errs, "full", "validation")
    np.testing.assert_allclose(d["mse/validation/full/relative"],
                               6.0 / 3 * 1471)


# ------------------------------ image ops ------------------------------ #
def test_resize_nearest_matches_torch():
    x = rnd((2, 10, 8, 3), 8)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expect = F.interpolate(tx, size=(4, 3), mode="nearest").permute(0, 2, 3, 1).numpy()
    got = np.asarray(I.resize_nearest(jnp.asarray(x), 4, 3))
    np.testing.assert_allclose(got, expect)
    # upsample too (SPADE re-interpolates seg up at later blocks)
    expect = F.interpolate(tx, size=(20, 16), mode="nearest").permute(0, 2, 3, 1).numpy()
    got = np.asarray(I.resize_nearest(jnp.asarray(x), 20, 16))
    np.testing.assert_allclose(got, expect)


def test_resize_bilinear_matches_torch():
    x = rnd((1, 7, 5, 1), 9)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expect = F.interpolate(tx, size=(14, 11), mode="bilinear",
                           align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(I.resize_bilinear(jnp.asarray(x), 14, 11))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_avg_pool_count_include_pad_false():
    x = rnd((1, 6, 6, 2), 10)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    expect = F.avg_pool2d(tx, kernel_size=3, stride=2, padding=1,
                          count_include_pad=False)
    expect = expect.permute(0, 2, 3, 1).numpy()
    got = np.asarray(I.avg_pool_3x3s2(jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_one_hot_label():
    lab = np.array([[[0, 1], [2, 3]]])
    oh = np.asarray(I.one_hot_label(jnp.asarray(lab), 4))
    assert oh.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(oh.argmax(-1), lab)


def test_colorize_segmap():
    seg = np.array([0, 1, 2, 3])
    got = np.asarray(I.colorize_segmap(jnp.asarray(seg)))
    np.testing.assert_array_equal(got, [125, 103, 76, 34])
