"""Pallas kernel tests (interpreter mode on the CPU test mesh) vs the
lax.reduce_window oracle path."""
import numpy as np
import pytest

from citlab_as_tpu.ops.morphology import morph_open
from citlab_as_tpu.ops.pallas.separator_morphology import fused_separator_masks


def _oracle(cleaned, h_k, v_k, noise_k):
    import jax.numpy as jnp
    x = jnp.asarray(cleaned, jnp.float32)
    horizontal = morph_open(x, h_k, 1)
    vertical = morph_open(x, 1, v_k)
    horizontal = jnp.clip(horizontal - vertical, 0, 255)
    horizontal = morph_open(horizontal, noise_k, 1)
    return np.asarray(horizontal), np.asarray(vertical)


def _synthetic(h=96, w=300, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.float32)
    img[40:43, 10:290] = 255.0          # horizontal rule
    img[5:90, 150:153] = 255.0          # vertical rule
    img[(rng.rand(h, w) < 0.01)] = 255.0  # noise
    return img


@pytest.mark.parametrize("kernels", [(5, 7, 3), (15, 30, 10), (4, 6, 2)])
def test_fused_masks_match_oracle(kernels):
    h_k, v_k, noise_k = kernels
    img = _synthetic()
    got_h, got_v = fused_separator_masks(img, h_k, v_k, noise_k, interpret=True)
    want_h, want_v = _oracle(img, h_k, v_k, noise_k)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)
    np.testing.assert_array_equal(np.asarray(got_h), want_h)


def test_fused_masks_multi_stripe():
    """Image wider than one stripe exercises the halo DMA path."""
    img = _synthetic(h=64, w=700, seed=3)
    got_h, got_v = fused_separator_masks(img, 11, 16, 7, interpret=True)
    want_h, want_v = _oracle(img, 11, 16, 7)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)
    np.testing.assert_array_equal(np.asarray(got_h), want_h)


def test_fused_masks_border_semantics():
    """Runs touching the image border must match cv2's identity padding."""
    img = np.zeros((40, 280), np.float32)
    img[0:3, :] = 255.0      # rule on the top border
    img[:, 0:3] = 255.0      # rule on the left border
    got_h, got_v = fused_separator_masks(img, 9, 9, 5, interpret=True)
    want_h, want_v = _oracle(img, 9, 9, 5)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)
    np.testing.assert_array_equal(np.asarray(got_h), want_h)
