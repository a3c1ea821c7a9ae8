"""Rect / ellipse / cross morphology on device.

Replaces cv2.morphologyEx / getStructuringElement used in the separator
post-processor (separator_net_post_processor.py:71-86) and morphology.py:30
(which supports MORPH_RECT, MORPH_ELLIPSE and MORPH_CROSS). Rect kernels map
onto lax.reduce_window (straight onto the VPU); non-rect structuring
elements reduce a min/max over one shifted slice per active kernel offset —
the offsets are static, so XLA fuses the whole stack into one elementwise
program. Border values follow cv2's defaults (erode pads +identity so
borders don't erode).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
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


def structuring_element(kind: str, kw: int, kh: int) -> np.ndarray:
    """cv2.getStructuringElement twin (bit-parity asserted in
    tests/test_ops.py): returns a (kh, kw) uint8 mask for kind
    'rect' | 'ellipse' | 'cross', anchored at (kh//2, kw//2).

    The ellipse follows cv2's row-scan construction: for each row the
    half-width is ``round_half_even(c * sqrt((r^2 - dy^2) / r^2))`` with
    r = kh//2, c = kw//2 (cvRound = banker's rounding); the cross is the
    anchor row plus the anchor column.
    """
    if kind == "rect" or (kw == 1 and kh == 1):
        return np.ones((kh, kw), np.uint8)
    mask = np.zeros((kh, kw), np.uint8)
    ax, ay = kw // 2, kh // 2
    if kind == "cross":
        mask[ay, :] = 1
        mask[:, ax] = 1
        return mask
    if kind != "ellipse":
        raise ValueError(f"Unknown structuring-element kind '{kind}'")
    r, c = kh // 2, kw // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    for i in range(kh):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
        j1, j2 = max(c - dx, 0), min(c + dx + 1, kw)
        mask[i, j1:j2] = 1
    return mask


def _masked_reduce(image: jnp.ndarray, kind: str, kw: int, kh: int,
                   op, init) -> jnp.ndarray:
    """Min/max over the active offsets of a non-rect structuring element:
    one statically-shifted slice of the init-padded image per offset,
    folded with ``op``. cv2 anchor convention (floor(k/2)) as in
    :func:`_window_reduce`."""
    mask = structuring_element(kind, kw, kh)
    img = image.astype(jnp.float32)
    lead = img.ndim - 2
    h, w = img.shape[-2], img.shape[-1]
    pad_t, pad_b = kh // 2, kh - 1 - kh // 2
    pad_l, pad_r = kw // 2, kw - 1 - kw // 2
    padded = jnp.pad(
        img, ((0, 0),) * lead + ((pad_t, pad_b), (pad_l, pad_r)),
        constant_values=init)
    out = None
    for i, j in np.argwhere(mask):
        window = lax.slice_in_dim(
            lax.slice_in_dim(padded, int(i), int(i) + h, axis=lead),
            int(j), int(j) + w, axis=lead + 1)
        out = window if out is None else op(out, window)
    return out


@partial(jax.jit, static_argnames=("kw", "kh", "kind"))
def erode_masked(image: jnp.ndarray, kw: int, kh: int,
                 kind: str = "ellipse") -> jnp.ndarray:
    """Grayscale erosion with an ellipse/cross structuring element
    (cv2.erode parity; morphology.py:30 MORPH_ELLIPSE/MORPH_CROSS)."""
    return _masked_reduce(image, kind, kw, kh, jnp.minimum, jnp.inf)


@partial(jax.jit, static_argnames=("kw", "kh", "kind"))
def dilate_masked(image: jnp.ndarray, kw: int, kh: int,
                  kind: str = "ellipse") -> jnp.ndarray:
    return _masked_reduce(image, kind, kw, kh, jnp.maximum, -jnp.inf)


@partial(jax.jit, static_argnames=("kw", "kh", "kind"))
def morph_open_masked(image: jnp.ndarray, kw: int, kh: int,
                      kind: str = "ellipse") -> jnp.ndarray:
    return dilate_masked(erode_masked(image, kw, kh, kind), kw, kh, kind)


@partial(jax.jit, static_argnames=("kw", "kh", "kind"))
def morph_close_masked(image: jnp.ndarray, kw: int, kh: int,
                       kind: str = "ellipse") -> jnp.ndarray:
    return erode_masked(dilate_masked(image, kw, kh, kind), kw, kh, kind)
