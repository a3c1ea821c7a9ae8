"""Connected-component labeling + stats on device.

Replaces cv2.connectedComponentsWithStats (8-connectivity) used by
apply_cc_analysis (region_net_post_processor_base.py:230-251) and the SWT
(swt_dist_trafo.py:31-66). Algorithm: label = min row-major index of the
component, reached by iterating {horizontal-run min, vertical-run min,
8-neighbor min} to a fixpoint — run propagation resolves whole straight
segments per step, so iterations ~ number of 'turns' in the worst component,
not its diameter. All steps are segment reductions and shifts: static
shapes, no host sync, vmap/pjit-friendly.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BG = np.int32(1 << 30)   # np, not jnp: a module-level jnp constant
# would initialize the default (axon) backend at import time in every
# process that has not forced CPU yet (spawned workers hung on this
# when the relay was down)


def _run_min_scan(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """Segmented associative-scan formulation of :func:`_run_min` (fallback
    when the packed-key encoding would overflow int32). 8 ms/sweep on v5e at
    1536x1024 — the packed cummax variant below is preferred."""
    start = fg & ~jnp.pad(fg, ((0, 0), (1, 0)))[:, :-1]
    vals = jnp.where(fg, labels, _BG)

    def comb(a, b):
        av, a_start = a
        bv, b_start = b
        return (jnp.where(b_start, bv, jnp.minimum(av, bv)),
                a_start | b_start)

    fwd, _ = jax.lax.associative_scan(comb, (vals, start), axis=1)
    end_rev = (fg & ~jnp.pad(fg, ((0, 0), (0, 1)))[:, 1:])[:, ::-1]
    bwd, _ = jax.lax.associative_scan(comb, (vals[:, ::-1], end_rev), axis=1)
    out = jnp.minimum(fwd, bwd[:, ::-1])
    return jnp.where(fg, jnp.minimum(labels, out), labels)


def _run_min_cummax(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """Packed-key cummax formulation of :func:`_run_min`: with run index r
    (cumsum of run starts) and value v < VMAX, the key r*(VMAX+1)+(VMAX-v)
    is strictly larger for later runs, and within a run its prefix-max
    carries the prefix-MIN of v. Measured 3.6 ms/sweep at 1536x1024 on v5e
    (lax.cummax lowers to a log-pass scan with poor locality) — kept as the
    oracle twin of the faster doubling variant below. Requires
    max_runs*(VMAX+1) < 2^31; larger images fall back to the assoc scan.
    """
    h, w = labels.shape
    vmax = h * w  # labels are row-major indices < h*w at fg pixels
    max_runs = (w + 1) // 2 + 1
    if max_runs * (vmax + 1) >= (1 << 31):
        return _run_min_scan(labels, fg)
    scale = jnp.int32(vmax + 1)

    def directional(lab, fgd):
        start = fgd & ~jnp.pad(fgd, ((0, 0), (1, 0)))[:, :-1]
        runid = jnp.cumsum(start.astype(jnp.int32), axis=1)
        # bg pixels: complement part 0 — below every fg key of the same run
        comp = jnp.where(fgd, vmax - lab, 0)
        key = runid * scale + comp
        return vmax - jax.lax.cummax(key, axis=1) % scale

    fwd = directional(labels, fg)
    bwd = directional(labels[:, ::-1], fg[:, ::-1])[:, ::-1]
    run_min = jnp.minimum(fwd, bwd)  # prefix-min from left / right => run min
    return jnp.where(fg, jnp.minimum(labels, run_min), labels)


def _shift_right(arr: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    """Shift along axis 1 by +k, filling vacated cells (pad+slice: fusable)."""
    return jnp.pad(arr, ((0, 0), (k, 0)), constant_values=fill)[:, :-k]


def _shift_ax(arr: jnp.ndarray, k: int, fill, axis: int) -> jnp.ndarray:
    """Shift by k (either sign) along ``axis``, filling vacated cells."""
    n = arr.shape[axis]
    pad = [(0, 0)] * arr.ndim
    sl = [slice(None)] * arr.ndim
    if k >= 0:
        pad[axis] = (k, 0)
        sl[axis] = slice(0, n)
    else:
        pad[axis] = (0, -k)
        sl[axis] = slice(-k, n - k)
    return jnp.pad(arr, pad, constant_values=fill)[tuple(sl)]


def _run_min(labels: jnp.ndarray, fg: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Min label within each run of foreground pixels along ``axis``.

    Run-clipped suffix/prefix-min by DOUBLING: level k keeps s_k[x] = min
    over [max(run_start(x), x-2^k+1) .. x] and r_k[x] = "window all fg";
    each level is two shifted selects — plain vector ops XLA fuses into a
    handful of streaming passes, beating both the associative-scan (8 ms)
    and cummax (3.6 ms) formulations per sweep at 1536x1024. The column
    direction shifts along axis -2 directly (no swapaxes copies)."""
    w = labels.shape[axis]
    vals = jnp.where(fg, labels, _BG)

    def directional(v0, r0, sgn):
        s, r = v0, r0
        k = 1
        while k < w:
            s = jnp.where(r, jnp.minimum(s, _shift_ax(s, sgn * k, _BG, axis)), s)
            r = r & _shift_ax(r, sgn * k, False, axis)
            k <<= 1
        return s

    fwd = directional(vals, fg, 1)
    bwd = directional(vals, fg, -1)
    run_min = jnp.minimum(fwd, bwd)
    return jnp.where(fg, jnp.minimum(labels, run_min), labels)


def _neighbor_min(labels: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """Min over the 8-neighborhood (connectivity glue for diagonals).

    One 3x3 reduce_window (native TPU window codegen) instead of eight
    roll+mask+min passes; bg pixels hold _BG already (the min identity), so
    the window can read them directly."""
    win = jax.lax.reduce_window(
        labels, np.int32(1 << 30), jax.lax.min, window_dimensions=(3, 3),
        window_strides=(1, 1), padding=((1, 1), (1, 1)))
    return jnp.where(fg, jnp.minimum(labels, win), labels)


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components(binary: jnp.ndarray, max_iters: int = 256) -> jnp.ndarray:
    """8-connected labeling. Returns int32 HW: min row-major index of each
    component at its pixels, _BG-valued at background."""
    fg = jnp.asarray(binary) != 0
    h, w = fg.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    labels = jnp.where(fg, idx, _BG)

    def body(carry):
        labels, _, it = carry
        new = _run_min(labels, fg, axis=-1)
        new = _run_min(new, fg, axis=-2)
        new = _neighbor_min(new, fg)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True), 0))
    return labels


@jax.jit
def _component_sizes(labels: jnp.ndarray) -> jnp.ndarray:
    """Size per root label (flat array of length H*W; nonzero only at roots)."""
    h, w = labels.shape
    fg = labels < _BG
    seg = jnp.where(fg, labels, h * w).ravel()
    ones = jnp.ones_like(seg, dtype=jnp.int32)
    return jax.ops.segment_sum(ones, seg, num_segments=h * w + 1)[:-1]


@partial(jax.jit, static_argnames=())
def remove_small_components(binary: jnp.ndarray, min_size: jnp.ndarray) -> jnp.ndarray:
    """Zero out components smaller than ``min_size`` pixels; survivors become
    255 (apply_cc_analysis semantics, base:230-251).

    The per-root sizes land exactly at the ROOT pixels when reshaped (the
    label IS the root's flat index), so the size value can seed there and
    flow to the rest of the component through the same run/window max
    propagation the labeling uses — a per-pixel ``sizes[labels]`` gather
    here measured ~20 ms at 1536x1024 on v5e, the propagation ~5 ms. The
    size field is propagated as uint16 clamped to 32767 (only the
    ``>= min_size`` comparison matters and min_size is 100 in practice;
    min_size is clamped to the same bound) — half the fixpoint's traffic."""
    from citlab_as_tpu.ops.swt_device import _propagate_step_stack

    labels = connected_components(binary)
    sizes = _component_sizes(labels)
    h, w = labels.shape
    fg = labels < _BG
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    isroot = fg & (labels == idx)
    min_size16 = jnp.minimum(jnp.asarray(min_size, jnp.int32), 32767)
    size_field = jnp.where(
        isroot, jnp.minimum(sizes.reshape(h, w), 32767), 0
    ).astype(jnp.uint16)[None]

    def body(carry):
        v, _, it = carry
        nv = _propagate_step_stack(v, fg)
        return nv, jnp.any(nv != v), it + 1

    size_field, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < 256), body,
        (size_field, jnp.bool_(True), 0))
    keep = fg & (size_field[0].astype(jnp.int32) >= min_size16)
    return jnp.where(keep, 255, 0).astype(jnp.uint8)


@jax.jit
def _stats_arrays(labels: jnp.ndarray):
    h, w = labels.shape
    fg = labels < _BG
    seg = jnp.where(fg, labels, h * w).ravel()
    n = h * w + 1
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).ravel()
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).ravel()
    ones = jnp.ones_like(seg, dtype=jnp.int32)
    size = jax.ops.segment_sum(ones, seg, num_segments=n)
    x0 = jax.ops.segment_min(xx, seg, num_segments=n)
    x1 = jax.ops.segment_max(xx, seg, num_segments=n)
    y0 = jax.ops.segment_min(yy, seg, num_segments=n)
    y1 = jax.ops.segment_max(yy, seg, num_segments=n)
    return size[:-1], x0[:-1], y0[:-1], x1[:-1], y1[:-1]


def cc_stats(binary) -> Tuple[np.ndarray, List[Tuple[int, int, int, int, int]]]:
    """Device labeling + per-component (x, y, w, h, size) stats.

    Returns (labels ndarray, stats list ordered by first pixel in row-major
    order — the same discovery order cv2.connectedComponentsWithStats uses).
    """
    labels = np.asarray(connected_components(jnp.asarray(binary)))
    size, x0, y0, x1, y1 = (np.asarray(a) for a in _stats_arrays(jnp.asarray(labels)))
    roots = np.unique(labels[labels < int(_BG)])
    stats = [
        (int(x0[r]), int(y0[r]), int(x1[r] - x0[r] + 1), int(y1[r] - y0[r] + 1), int(size[r]))
        for r in roots
    ]
    return labels, stats


@jax.jit
def segment_max_per_component(labels: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Max of ``values`` per component (flat per-root array); used for
    per-CC stroke width (max distance-transform value inside the CC)."""
    h, w = labels.shape
    fg = labels < _BG
    seg = jnp.where(fg, labels, h * w).ravel()
    out = jax.ops.segment_max(values.ravel(), seg, num_segments=h * w + 1)
    return out[:-1]
