"""Pallas TPU kernel: fused separator-mask morphology.

The separator post-process (separator_net_post_processor.py:71-97) chains
four rect-kernel morphology openings + a saturating subtract over the same
image: horizontal open (W x 1), vertical open (1 x H), subtract, noise open.
As separate XLA reduce_window calls this is 6+ HBM round-trips over a
memory-bound problem; this kernel runs the WHOLE chain in one pallas_call.

Design: grid over column stripes (full image height x TILE_W columns).
Each stripe DMAs its slice + HALO columns of horizontal context from HBM
into VMEM, runs every pass on-chip, and writes only its central columns:
one HBM read + two writes total. Sliding min/max windows use the doubling
construction (ceil(log2 k) shifted combines on the VPU via pltpu.roll +
iota masks). The vertical open needs no halo (stripes span the full
height).

Border semantics match cv2/ops.morphology exactly: erosion pads +inf,
dilation -inf, anchor at k//2; positions outside the true image are forced
to the pass identity before each window reduce so the stripe halo padding
never leaks in. The lax.reduce_window implementation
(citlab_as_tpu.ops.morphology) stays as fallback and test oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_W = 128
HALO = 64  # must cover h_kernel + noise_kernel window extents
# (stripe = full height x (TILE_W + 2*HALO) floats; sized so scratch +
# output blocks + doubling intermediates stay well under the 16 MB VMEM)


def _shift_axis(x, shift: int, fill: float, axis: int):
    """out[i] = x[i + shift] along ``axis``; vacated slots = fill.

    pltpu.roll only accepts non-negative circular shifts (toward higher
    indices), so a logical shift of +s becomes a circular roll by n - s."""
    if shift == 0:
        return x
    n = x.shape[axis]
    rolled = pltpu.roll(x, (-shift) % n, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    valid = idx < n - shift if shift > 0 else idx >= -shift
    return jnp.where(valid, rolled, fill)


def _shift_cols(x, shift: int, fill: float):
    return _shift_axis(x, shift, fill, axis=1)


def _shift_rows(x, shift: int, fill: float):
    return _shift_axis(x, shift, fill, axis=0)


def _window_1d(x, k: int, op, pad_val: float, axis: int):
    """Sliding reduce of width k, cv2 anchor (lead k//2), via doubling.

    k//2 identity elements are physically prepended, so m[i] covers
    x[i - k//2 .. i - k//2 + k - 1] with virtual identity padding on BOTH
    borders (the doubling's shift fill covers the trailing side) — exactly
    reduce_window's explicit-padding semantics."""
    if k <= 1:
        return x
    lead = k // 2
    shift = _shift_cols if axis == 1 else _shift_rows
    pad_shape = list(x.shape)
    pad_shape[axis] = lead
    m = jnp.concatenate(
        [jnp.full(pad_shape, pad_val, dtype=x.dtype), x], axis=axis)
    width = 1
    while width < k:
        s = min(width, k - width)
        m = op(m, shift(m, s, pad_val))
        width += s
    return m[:, :x.shape[1]] if axis == 1 else m[:x.shape[0], :]


def _masked_open(x, k: int, axis: int, valid):
    """Opening along axis with out-of-image positions neutralized per pass."""
    x = jnp.where(valid, x, jnp.inf)
    x = _window_1d(x, k, jnp.minimum, jnp.inf, axis)
    x = jnp.where(valid, x, -jnp.inf)
    x = _window_1d(x, k, jnp.maximum, -jnp.inf, axis)
    return x


def _make_kernel(h_k: int, v_k: int, noise_k: int, width: int, height: int,
                 h_padded: int):
    stripe_w = TILE_W + 2 * HALO

    def kernel(img_hbm, h_out, v_out, scratch, sem):
        j = pl.program_id(0)
        copy = pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(j * TILE_W, stripe_w)], scratch, sem)
        copy.start()
        copy.wait()
        x = scratch[:]

        # global column of local position i: j*TILE_W + i - HALO
        local = jax.lax.broadcasted_iota(jnp.int32, (h_padded, stripe_w), 1)
        gcol = local + j * TILE_W - HALO
        grow = jax.lax.broadcasted_iota(jnp.int32, (h_padded, stripe_w), 0)
        valid = (gcol >= 0) & (gcol < width) & (grow < height)

        horizontal = _masked_open(x, h_k, 1, valid)
        vertical = _masked_open(x, v_k, 0, valid)
        sub = jnp.clip(horizontal - vertical, 0.0, 255.0)  # cv2.subtract saturates
        noise = _masked_open(sub, noise_k, 1, valid)

        zero = jnp.float32(0.0)
        h_out[:] = jnp.where(valid, noise, zero)[:, HALO:HALO + TILE_W]
        v_out[:] = jnp.where(valid, vertical, zero)[:, HALO:HALO + TILE_W]

    return kernel


@partial(jax.jit, static_argnames=("h_kernel", "v_kernel", "noise_kernel",
                                   "interpret"))
def fused_separator_masks(cleaned: jnp.ndarray, h_kernel: int, v_kernel: int,
                          noise_kernel: int, interpret: bool = False):
    """(horizontal, vertical) float32 masks from the CC-cleaned 0/255 image.

    Fused pallas pipeline; set ``interpret=True`` on non-TPU backends.
    """
    assert h_kernel + noise_kernel < HALO and h_kernel < HALO, \
        f"kernel sizes exceed halo ({h_kernel}, {noise_kernel} vs {HALO})"
    img = cleaned.astype(jnp.float32)
    h, w = img.shape
    n_tiles = pl.cdiv(w, TILE_W)
    w_padded = n_tiles * TILE_W
    h_padded = ((h + 7) // 8) * 8  # mosaic sublane tiling alignment
    # pad: HALO left, HALO + tile remainder right; rows up to h_padded
    img_padded = jnp.pad(
        img, ((0, h_padded - h), (HALO, HALO + w_padded - w)))

    out_shape = jax.ShapeDtypeStruct((h_padded, w_padded), jnp.float32)
    horizontal, vertical = pl.pallas_call(
        _make_kernel(h_kernel, v_kernel, noise_kernel, w, h, h_padded),
        grid=(n_tiles,),
        out_shape=(out_shape, out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((h_padded, TILE_W), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_padded, TILE_W), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((h_padded, TILE_W + 2 * HALO), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * h_padded * w_padded * int(
                np.log2(max(h_kernel, v_kernel, noise_kernel, 2)) + 1),
            bytes_accessed=5 * 4 * h_padded * w_padded,
            transcendentals=0),
        interpret=interpret,
    )(img_padded)
    return horizontal[:h, :w], vertical[:h, :w]


def pallas_supported() -> bool:
    """Compiled pallas path available (TPU backend)."""
    return jax.default_backend() == "tpu"
