"""Rect-kernel morphology on device via lax.reduce_window.

Replaces cv2.morphologyEx / getStructuringElement(MORPH_RECT) used in the
separator post-processor (separator_net_post_processor.py:71-86) and
morphology.py. reduce_window min/max maps straight onto the VPU; border
values follow cv2's defaults (erode pads +identity so borders don't erode).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _window_reduce(image: jnp.ndarray, kw: int, kh: int, op, init) -> jnp.ndarray:
    """Apply a (kh x kw) sliding-window reduction over the last two axes
    (leading axes, e.g. batch, are windowed with size 1).

    cv2 anchors kernels at floor(k/2) and samples offsets ``[0..k-1] - anchor``
    for both erosion and dilation (verified against cv2 for even kernels), so
    the leading pad is ``k//2``, trailing ``k-1-k//2``.
    """
    img = image.astype(jnp.float32)

    def pads(k):
        return k // 2, k - 1 - k // 2

    lead = img.ndim - 2
    return lax.reduce_window(
        img, init, op,
        window_dimensions=(1,) * lead + (kh, kw),
        window_strides=(1,) * (lead + 2),
        padding=((0, 0),) * lead + (pads(kh), pads(kw)),
    )


@partial(jax.jit, static_argnames=("kw", "kh"))
def erode(image: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    """Grayscale erosion with a (kw x kh) rect kernel (cv2 width-first order)."""
    return _window_reduce(image, kw, kh, lax.min, jnp.inf)


@partial(jax.jit, static_argnames=("kw", "kh"))
def dilate(image: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    return _window_reduce(image, kw, kh, lax.max, -jnp.inf)


@partial(jax.jit, static_argnames=("kw", "kh"))
def morph_open(image: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    """Opening = erode then dilate; removes runs shorter than the kernel."""
    return dilate(erode(image, kw, kh), kw, kh)


@partial(jax.jit, static_argnames=("kw", "kh"))
def morph_close(image: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    return erode(dilate(image, kw, kh), kw, kh)
