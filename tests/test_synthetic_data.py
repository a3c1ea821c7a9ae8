"""On-device synthetic page generator tests (CPU backend)."""
import jax
import numpy as np
import pytest

from citlab_as_tpu.train.synthetic_data import synthetic_batch


def test_synthetic_batch_shapes_and_classes():
    key = jax.random.PRNGKey(0)
    img, lab = synthetic_batch(key, 2, 128, 128)
    assert img.shape == (2, 128, 128, 1)
    assert lab.shape == (2, 128, 128)
    img_np = np.asarray(img)
    lab_np = np.asarray(lab)
    assert img_np.min() >= -0.2 and img_np.max() <= 1.01
    assert set(np.unique(lab_np)).issubset({0, 1})
    # separators exist but are sparse
    sep_frac = (lab_np == 0).mean()
    assert 0.001 < sep_frac < 0.2
    # separator pixels are dark in the image
    sep_pixels = img_np[..., 0][lab_np == 0]
    assert sep_pixels.mean() < 0.4


def test_synthetic_batch_deterministic_and_varied():
    key = jax.random.PRNGKey(7)
    img1, _ = synthetic_batch(key, 1, 64, 64)
    img2, _ = synthetic_batch(key, 1, 64, 64)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    img3, _ = synthetic_batch(jax.random.fold_in(key, 1), 1, 64, 64)
    assert not np.array_equal(np.asarray(img1), np.asarray(img3))


def test_heading_mode_labels():
    key = jax.random.PRNGKey(3)
    _, lab = synthetic_batch(key, 2, 128, 128, heading_mode=True)
    lab_np = np.asarray(lab)
    frac = (lab_np == 0).mean()
    assert 0.0 < frac < 0.3
