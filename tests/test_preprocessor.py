"""Host-side pre/post-processor parity (reference: data/postprocessor.py)."""
import numpy as np
import pytest

from seg2eye_tpu.data import preprocessor as P


def test_as_batch():
    assert P.as_batch(np.zeros((4, 5))).shape == (1, 4, 5, 1)
    assert P.as_batch(np.zeros((4, 5, 1))).shape == (1, 4, 5, 1)
    assert P.as_batch(np.zeros((2, 4, 5, 1))).shape == (2, 4, 5, 1)
    with pytest.raises(ValueError):
        P.as_batch(np.zeros((1, 2, 4, 5, 1)))


def test_unnormalize_range_sniffing():
    # [-1,1] path with truncation
    x = np.array([-1.0, 0.0, 1.0])
    np.testing.assert_array_equal(P.unnormalize(x), [0, 127, 255])
    # label-map path
    lab = np.array([0.0, 3.0])
    np.testing.assert_array_equal(P.unnormalize(lab), [0, 255])
    # already [0,255]
    img = np.array([5.0, 250.0])
    np.testing.assert_array_equal(P.unnormalize(img), [5, 250])
    with pytest.raises(ValueError):
        P.unnormalize(np.array([-5.0, 300.0]))


def test_normalize():
    np.testing.assert_allclose(P.normalize(np.array([0.0, 255.0])), [-1, 1])
    x = np.array([-0.5, 0.5])
    np.testing.assert_allclose(P.normalize(x), x)


def test_error_map_range():
    fake = np.array([0.0, 0.5, 1.0])
    target = np.zeros(3)
    em = P.get_error_map(fake, target)
    assert em.min() == -1.0 and em.max() == 1.0
