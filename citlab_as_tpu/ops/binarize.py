"""Gaussian blur + Otsu binarization on device.

Reference: python_util/image_processing/swt_dist_trafo.py:26-29 and
image_binarizer.py — cv2.GaussianBlur(5x5) then THRESH_BINARY+THRESH_OTSU.
The Gaussian kernel matches cv2.getGaussianKernel's default sigma for the
kernel size; Otsu maximizes between-class variance over the 256-bin
histogram, with cv2's midpoint convention.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# cv2.getGaussianKernel with sigma<=0 uses these fixed binomial kernels for
# ksize 1/3/5/7 (small_gaussian_tab in OpenCV), not the sigma formula.
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125], np.float32),
}


def _gaussian_kernel_1d(ksize: int) -> np.ndarray:
    if ksize in _SMALL_GAUSSIAN_TAB:
        return _SMALL_GAUSSIAN_TAB[ksize]
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize",))
def gaussian_blur(image: jnp.ndarray, ksize: int = 5) -> jnp.ndarray:
    """Separable Gaussian blur with replicate border (cv2 default
    BORDER_REFLECT_101 differs only on the outermost pixels; we use edge
    replication which matches within the filter radius for page images)."""
    k = _gaussian_kernel_1d(ksize)
    img = image.astype(jnp.float32)
    pad = ksize // 2
    # separable blur as shifted multiply-adds (the vmapped jnp.convolve
    # formulation lowered to slow per-column code on TPU); the symmetric
    # kernel makes the tap order identical to np.convolve's
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = sum(float(k[i]) * x[i:i + img.shape[0], :] for i in range(ksize))
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = sum(float(k[i]) * x[:, i:i + img.shape[1]] for i in range(ksize))
    return x


@jax.jit
def otsu_threshold(image: jnp.ndarray):
    """Otsu threshold of a uint8-range image. Returns (threshold, binary*255)
    with cv2's convention: foreground = pixel > threshold."""
    img = jnp.clip(jnp.round(image.astype(jnp.float32)), 0, 255).astype(jnp.int32)
    # compare-reduce histogram: one streaming pass with 256 accumulators
    # (a scatter-add .at[].add histogram serializes on TPU)
    bins256 = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum((img.reshape(-1, 1) == bins256[None, :]).astype(jnp.float32),
                   axis=0)
    total = hist.sum()
    bins = jnp.arange(256, dtype=jnp.float32)

    w0 = jnp.cumsum(hist)                       # class 0 = pixels <= t
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    w1 = total - w0
    mu0 = jnp.where(w0 > 0, sum0 / w0, 0.0)
    mu1 = jnp.where(w1 > 0, (sum_all - sum0) / w1, 0.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    between = jnp.where(valid, between, -1.0)
    t = jnp.argmax(between)

    binary = jnp.where(img > t, 255, 0).astype(jnp.uint8)
    return t.astype(jnp.float32), binary


def otsu_binarize(image, blur_ksize: int = 5):
    """Blur-then-Otsu pipeline of swt_dist_trafo.py:26-29."""
    blurred = gaussian_blur(jnp.asarray(image), blur_ksize)
    return otsu_threshold(blurred)


def otsu_binarize_host(image: np.ndarray, blur_ksize: int = 5):
    """Pure-numpy twin of :func:`otsu_binarize` for the CPU fast path
    (same kernels, same edge padding, same Otsu argmax): when the active
    backend is the CPU anyway, scipy's C correlate beats tracing/dispatching
    the jitted version and avoids two jax<->numpy copies per page."""
    from scipy.ndimage import correlate1d

    k = _gaussian_kernel_1d(blur_ksize).astype(np.float32)
    img = np.asarray(image, np.float32)
    x = correlate1d(img, k, axis=0, mode="nearest")
    x = correlate1d(x, k, axis=1, mode="nearest")

    q = np.clip(np.round(x), 0, 255).astype(np.int32)
    hist = np.bincount(q.ravel(), minlength=256).astype(np.float64)
    bins = np.arange(256, dtype=np.float64)
    w0 = np.cumsum(hist)
    sum0 = np.cumsum(hist * bins)
    total, sum_all = w0[-1], sum0[-1]
    w1 = total - w0
    with np.errstate(divide="ignore", invalid="ignore"):
        mu0 = np.where(w0 > 0, sum0 / w0, 0.0)
        mu1 = np.where(w1 > 0, (sum_all - sum0) / w1, 0.0)
    between = np.where((w0 > 0) & (w1 > 0), w0 * w1 * (mu0 - mu1) ** 2, -1.0)
    t = int(np.argmax(between))
    binary = np.where(q > t, 255, 0).astype(np.uint8)
    return float(t), binary
