"""On-device synthetic newspaper-page generator for segmentation training.

The axon tunnel moves ~1 MB/s, so feeding real scans to the TPU would
starve training. Instead this jitted generator synthesizes newspaper-like
pages (text-line bands in columns, thin horizontal/vertical separator
rules, scan noise) directly in HBM from a PRNG key — the whole train loop
runs without host transfers. Labels follow the separator-net contract
(channel 0 = separator, channel 1 = other) or the heading-net contract
(channel 0 = heading text).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _smooth_noise(key, h: int, w: int, scale: int) -> jnp.ndarray:
    """Low-res uniform noise block-upsampled -> blobby [0,1] field.

    Uses jnp.repeat instead of jax.image.resize — the gather-based resize
    lowering compiles ~100x slower through the remote TPU compiler and the
    blocky field is equally good as a word-mask source."""
    lh, lw = max(1, -(-h // scale)), max(1, -(-w // scale))
    low = jax.random.uniform(key, (lh, lw))
    up = jnp.repeat(jnp.repeat(low, scale, axis=0), scale, axis=1)
    return up[:h, :w]


def _page_sample(key, h: int, w: int, heading_mode: bool):
    keys = jax.random.split(key, 10)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    # ---- columns: one vertical separator at a random x
    col_x = jax.random.randint(keys[0], (), int(0.3 * w), int(0.7 * w))
    col_w = jax.random.randint(keys[1], (), 2, 5)
    v_y0 = jax.random.randint(keys[2], (), 0, h // 4)
    v_y1 = jax.random.randint(keys[3], (), 3 * h // 4, h)
    v_sep = (jnp.abs(xx - col_x) < col_w) & (yy >= v_y0) & (yy < v_y1)

    # ---- horizontal separators: 3 rules at random ys inside a column
    h_sep = jnp.zeros((h, w), bool)
    for i in range(3):
        k1, k2, k3 = jax.random.split(keys[4 + i], 3)
        y = jax.random.randint(k1, (), int(0.1 * h), int(0.9 * h))
        thick = jax.random.randint(k2, (), 2, 4)
        left = jax.random.bernoulli(k3)
        x_lo = jnp.where(left, 10, col_x + col_w + 5)
        x_hi = jnp.where(left, col_x - col_w - 5, w - 10)
        h_sep = h_sep | ((jnp.abs(yy - y) < thick) & (xx >= x_lo) & (xx < x_hi))

    sep = v_sep | h_sep

    # ---- text: line bands with blobby word masks, margins at borders
    line_spacing = jax.random.randint(keys[7], (), 18, 30)
    text_height = (line_spacing * 3) // 5
    band = (yy % line_spacing) < text_height
    words = _smooth_noise(keys[8], h, w, scale=6) > 0.45
    margin = ((xx > 8) & (xx < w - 8) & (yy > 8) & (yy < h - 8)
              & (jnp.abs(xx - col_x) > col_w + 3))
    text = band & words & margin & ~sep

    # ---- heading text: a thicker, taller band near a horizontal rule
    key_h1, key_h2 = jax.random.split(keys[9])
    head_y = jax.random.randint(key_h1, (), int(0.1 * h), int(0.8 * h))
    head_h = jax.random.randint(key_h2, (), 24, 40)
    heading_zone = (yy >= head_y) & (yy < head_y + head_h)
    heading = heading_zone & words & margin & ~sep

    # ---- compose grayscale image in [0, 1]
    noise = _smooth_noise(keys[0], h, w, scale=2) * 0.08
    img = jnp.ones((h, w))
    img = jnp.where(text, 0.25 + noise * 2, img)
    img = jnp.where(heading, 0.1, img)
    img = jnp.where(sep, 0.15, img)
    img = img - noise

    if heading_mode:
        label = jnp.where(heading, 0, 1).astype(jnp.int32)
    else:
        label = jnp.where(sep, 0, 1).astype(jnp.int32)
    return img[..., None].astype(jnp.float32), label


@partial(jax.jit, static_argnames=("batch", "h", "w", "heading_mode"))
def synthetic_batch(key, batch: int, h: int, w: int,
                    heading_mode: bool = False):
    """(image [B,H,W,1] in [0,1], label [B,H,W] int {0=target,1=other})."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: _page_sample(k, h, w, heading_mode))(keys)
