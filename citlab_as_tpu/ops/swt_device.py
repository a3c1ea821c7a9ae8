"""Device-resident SWT feature extraction for the heading stage.

Reference semantics: heading_net_post_processor.py:211-245 +
swt_dist_trafo.py:18-66 — per page, a full-resolution stroke-width distance
transform (invert -> Gaussian+Otsu -> capped EDT), then per text line a crop
of that DT image is connected-component labeled and cleaned, yielding
``stroke_width`` (median of per-CC max DT) and ``text_height`` (max CC
height); plus the mean net probability over the (rescaled) line bbox.

The round-2 pipeline computed all of this on the HOST (~0.25 s/page on a
single-core host, ~half of it the full-res EDT) while the TPU sat idle.
Here the whole chain runs on device and only ``[n_lines, 3]`` scalars
(net_prob, stroke_width, text_height) are read back — the DT image itself
never crosses the (thin) host link.

TPU formulation:
- EDT: jump flooding (ops/distance_transform.py), vmapped over the page
  batch inside the fused heading program.
- per-line crops: dynamic_slice out of the zero-padded DT into a static
  [crop_h, crop_w] bucket, masked to the true bbox (numpy-slice clip
  semantics), batched over a padded line bucket.
- per-crop CC stats WITHOUT scatters or sorts: 8-adjacent foreground pixels
  are by definition the same component, so per-component aggregates are the
  fixpoint of {segmented run extreme along rows, along columns, 3x3 window
  extreme} — the same propagation structure (and convergence count) as the
  labeling itself. Five channels propagate together: min flat index (the
  label/root), max DT, max x, max (W-1-x), max y; min y falls out of the
  root index for free.
- per-CC median: component maxima live at root pixels only; their 256-bin
  histogram (DT is uint8) turns the median into a cumsum threshold search.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BG = jnp.int32(1 << 30)


def _shift_last(arr: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    pad = [(0, 0)] * (arr.ndim - 1) + [(k, 0)]
    return jnp.pad(arr, pad, constant_values=fill)[..., :-k]


def _run_extreme(vals: jnp.ndarray, fg: jnp.ndarray, maximize: bool):
    """Per-run extreme along the LAST axis (doubling; see
    connected_components._run_min for the recurrence)."""
    w = vals.shape[-1]
    identity = jnp.int32(-1) if maximize else _BG
    red = jnp.maximum if maximize else jnp.minimum
    masked = jnp.where(fg, vals, identity)

    def direction(v, r):
        s, rr, k = v, r, 1
        while k < w:
            s = jnp.where(rr, red(s, _shift_last(s, k, identity)), s)
            rr = rr & _shift_last(rr, k, False)
            k <<= 1
        return s

    fwd = direction(masked, fg)
    bwd = direction(masked[..., ::-1], fg[..., ::-1])[..., ::-1]
    out = red(fwd, bwd)
    return jnp.where(fg, red(vals, out), vals)


def _window_extreme(vals: jnp.ndarray, fg: jnp.ndarray, maximize: bool):
    identity = np.int32(-1) if maximize else np.int32(1 << 30)
    red = jax.lax.max if maximize else jax.lax.min
    nd = vals.ndim
    win = jax.lax.reduce_window(
        vals, identity, red,
        window_dimensions=(1,) * (nd - 2) + (3, 3),
        window_strides=(1,) * nd,
        padding=((0, 0),) * (nd - 2) + ((1, 1), (1, 1)))
    red2 = jnp.maximum if maximize else jnp.minimum
    return jnp.where(fg, red2(vals, win), vals)


def _propagate_step(vals: jnp.ndarray, fg: jnp.ndarray, maximize: bool):
    """One sweep: row runs, column runs, 3x3 window (all same-component by
    8-connectivity of adjacent foreground)."""
    vals = _run_extreme(vals, fg, maximize)
    vals = _run_extreme(vals.swapaxes(-1, -2), fg.swapaxes(-1, -2),
                        maximize).swapaxes(-1, -2)
    return _window_extreme(vals, fg, maximize)


@partial(jax.jit, static_argnames=("max_iters",))
def component_stats(crops_dt: jnp.ndarray, fg: jnp.ndarray,
                    max_iters: int = 64):
    """Per-pixel per-component aggregates for a stack of crops.

    ``crops_dt``: [L, H, W] int32 DT values; ``fg``: [L, H, W] bool.
    Returns (lab, mxx, mnx, mxy): min flat index per component and the
    component's max x / min x / max y, at every foreground pixel.
    """
    l, h, w = crops_dt.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (l, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (l, h, w), 2)
    flat = yy * w + xx

    lab0 = jnp.where(fg, flat, _BG)
    # stacked max channels: x, (w-1-x), y  ->  [3, L, H, W]
    # (min y falls out of the root index; the DT max is a rect query done
    # separately in _bbox_max)
    stats0 = jnp.stack([
        jnp.where(fg, xx, -1),
        jnp.where(fg, w - 1 - xx, -1),
        jnp.where(fg, yy, -1),
    ])
    fg4 = jnp.broadcast_to(fg, stats0.shape)

    def body(carry):
        lab, stats, _, it = carry
        nlab = _propagate_step(lab, fg, maximize=False)
        nstats = _propagate_step(stats, fg4, maximize=True)
        changed = jnp.any(nlab != lab) | jnp.any(nstats != stats)
        return nlab, nstats, changed, it + 1

    def cond(carry):
        return carry[2] & (carry[3] < max_iters)

    lab, stats, _, _ = jax.lax.while_loop(
        cond, body, (lab0, stats0, jnp.bool_(True), 0))
    mxx, mnxc, mxy = stats[0], stats[1], stats[2]
    return lab, mxx, w - 1 - mnxc, mxy


def _bbox_max(crops: jnp.ndarray, fg: jnp.ndarray, lab: jnp.ndarray,
              mnx: jnp.ndarray, mxx: jnp.ndarray) -> jnp.ndarray:
    """Max DT over each component's BOUNDING BOX (not the component itself —
    the reference reads np.max over the bbox crop, swt __main__ semantics
    mirrored in StrokeWidthDistanceTransform.textline_features, so pixels of
    overlapping neighbor components count too).

    Exact, gather-light formulation:
    1. every row y in [y0..y1] of an 8-connected component contains at least
       one of its pixels (row changes by <=1 along any connecting path), and
       all its pixels in a row share the converged (x0, x1) fields;
    2. so rect-max = component-max of r[p] := max dt over row(p) x [x0..x1],
       an interval query answered by 1-D doubling tables T_b[x] = max over
       [x, x+2^b) with two lookups;
    3. r then propagates to the root by one more (single-channel) component
       fixpoint.
    """
    l, h, w = crops.shape
    blog = max(1, (w - 1).bit_length())
    tables = [crops]
    t = crops
    k = 1
    while k < w:
        t = jnp.maximum(t, _shift_last(t[..., ::-1], k, -1)[..., ::-1])
        tables.append(t)
        k <<= 1
    tab = jnp.stack(tables)                     # [blog+1, L, H, W]

    width = jnp.where(fg, mxx - mnx + 1, 1)
    b = jnp.int32(31) - jax.lax.clz(width)      # floor(log2(width))
    yy = jax.lax.broadcasted_iota(jnp.int32, (l, h, w), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (l, h, w), 0)

    def flat_idx(xpos):
        return ((b * l + li) * h + yy) * w + xpos

    flat_tab = tab.reshape(-1)
    left = jnp.take(flat_tab, flat_idx(jnp.where(fg, mnx, 0)).ravel(),
                    mode="clip").reshape(l, h, w)
    rt = jnp.clip(jnp.where(fg, mxx, 0) - (1 << b) + 1, 0, w - 1)
    right = jnp.take(flat_tab, flat_idx(rt).ravel(),
                     mode="clip").reshape(l, h, w)
    r = jnp.where(fg, jnp.maximum(left, right), -1)

    def body(carry):
        v, _, it = carry
        nv = _propagate_step(v, fg, maximize=True)
        return nv, jnp.any(nv != v), it + 1

    r, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < 64), body, (r, jnp.bool_(True), 0))
    return r


@partial(jax.jit, static_argnames=("crop_h", "crop_w", "clean_ccs"))
def swt_line_stats(dt_u8: jnp.ndarray, boxes: jnp.ndarray,
                   crop_h: int, crop_w: int, clean_ccs: int = 2):
    """Per-line (stroke_width, text_height) from a device DT image.

    ``dt_u8``: [H, W] uint8 distance transform; ``boxes``: [L, 4] int32
    (x, y, w, h) line bboxes — the crop is dt[y:y+h+1, x:x+w+1] as in
    StrokeWidthDistanceTransform.textline_features. Lines must satisfy
    h+1 <= crop_h, w+1 <= crop_w (caller picks the bucket). Returns
    [L, 2] float32.
    """
    h_img, w_img = dt_u8.shape
    padded = jnp.pad(dt_u8.astype(jnp.int32),
                     ((0, crop_h), (0, crop_w)))

    def crop_one(box):
        x, y, bw, bh = box[0], box[1], box[2], box[3]
        c = jax.lax.dynamic_slice(padded, (y, x), (crop_h, crop_w))
        rr = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 1)
        return jnp.where((rr <= bh) & (cc <= bw), c, 0)

    crops = jax.vmap(crop_one)(boxes)          # [L, crop_h, crop_w]
    fg = crops > 0
    lab, mxx, mnx, mxy = component_stats(crops, fg)
    mdt = _bbox_max(crops, fg, lab, mnx, mxx)   # reference: max over CC BBOX

    mny = lab // crop_w                         # root = min row-major index
    ch = mxy - mny + 1
    cw = mxx - mnx + 1
    kept = fg
    if clean_ccs > 0:
        kept = kept & (cw >= 3) & (ch >= 3) & (ch <= 500) & (cw <= 500)
    if clean_ccs > 1:
        kept = kept & (cw <= 8 * ch) & (ch <= 8 * cw)

    l, hh, ww = crops.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (l, hh, ww), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (l, hh, ww), 2)
    isroot = kept & (lab == yy * ww + xx)

    text_height = jnp.max(jnp.where(isroot, ch, 0), axis=(1, 2))
    k = jnp.sum(isroot, axis=(1, 2))

    # median of root DT maxima via 256-bin histogram (DT is uint8)
    root_vals = jnp.where(isroot, mdt, -1).reshape(l, -1).astype(jnp.int16)
    bins = jnp.arange(256, dtype=jnp.int16)
    hist = jnp.sum(root_vals[:, :, None] == bins[None, None, :], axis=1)
    cum = jnp.cumsum(hist, axis=1)
    m1 = jnp.maximum(k - 1, 0) // 2
    m2 = k // 2
    v1 = jnp.argmax(cum > m1[:, None], axis=1)
    v2 = jnp.argmax(cum > m2[:, None], axis=1)
    stroke = jnp.where(k > 0, (v1 + v2).astype(jnp.float32) / 2.0, 0.0)
    return jnp.stack(
        [stroke, text_height.astype(jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("crop_h", "crop_w"))
def net_prob_sums(prob_u8: jnp.ndarray, boxes: jnp.ndarray,
                  crop_h: int, crop_w: int) -> jnp.ndarray:
    """Integer sum of the uint8 probability map over each line bbox.

    ``prob_u8``: [H, W] uint8 quantized probability map; ``boxes``: [L, 4]
    int32 (x, y, w, h); crop is prob[y:y+h, x:x+w] (numpy clip semantics —
    heading:247-270). Returning the EXACT int32 sum lets the host perform
    the /255 and /(w*h) divisions in float64, matching the host path
    bit-for-bit."""
    padded = jnp.pad(prob_u8.astype(jnp.int32), ((0, crop_h), (0, crop_w)))

    def one(box):
        x, y, bw, bh = box[0], box[1], box[2], box[3]
        c = jax.lax.dynamic_slice(padded, (y, x), (crop_h, crop_w))
        rr = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (crop_h, crop_w), 1)
        return jnp.sum(jnp.where((rr < bh) & (cc < bw), c, 0))

    return jax.vmap(one)(boxes)


def net_prob_means(prob_u8, boxes, crop_h: int, crop_w: int) -> np.ndarray:
    """Float64 mean net probability per bbox (sum on device, divide host)."""
    sums = np.asarray(net_prob_sums(prob_u8, boxes, crop_h=crop_h,
                                    crop_w=crop_w), np.float64)
    boxes = np.asarray(boxes)
    denom = boxes[:, 2].astype(np.float64) * boxes[:, 3] * 255.0
    return np.where((boxes[:, 2] > 0) & (boxes[:, 3] > 0),
                    sums / np.where(denom != 0, denom, 1.0), 0.0)


def _pow2(n: int, floor: int = 8) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


class DeviceLineFeatures:
    """Host bridge: pick static buckets, pad boxes, dispatch the jitted
    programs against device-resident DT / probability maps, slice results.

    Bucket policy: line count and crop dims round up to powers of two and
    only grow (programs compile once per bucket combination and are reused
    across pages/corpora).
    """

    def __init__(self):
        self._line_bucket = 16
        self._swt_crop = [64, 256]
        self._net_crop = [32, 256]

    def dispatch(self, dt_dev, prob_dev, swt_boxes: np.ndarray,
                 net_boxes: np.ndarray):
        """Enqueue both per-line programs (async); returns a zero-arg
        callable yielding ([L] net_prob f64, [L, 2] (stroke, text_height)).
        swt_boxes/net_boxes: [L, 4] int32 (x, y, w, h); rows with w<0 mark
        invalid lines (no surrounding polygon) -> zeros."""
        n = len(swt_boxes)
        lb = max(self._line_bucket, _pow2(max(n, 1), floor=16))
        self._line_bucket = lb
        sb = np.zeros((lb, 4), np.int32)
        nb = np.zeros((lb, 4), np.int32)
        valid = np.ones(n, bool)
        if n:
            sb[:n] = swt_boxes
            nb[:n] = net_boxes
            valid = swt_boxes[:, 2] >= 0
            sb[:n][~valid] = 0
            nb[:n][~valid] = 0
        self._swt_crop[0] = max(self._swt_crop[0],
                                _pow2(int(sb[:, 3].max(initial=0)) + 1))
        self._swt_crop[1] = max(self._swt_crop[1],
                                _pow2(int(sb[:, 2].max(initial=0)) + 1))
        self._net_crop[0] = max(self._net_crop[0],
                                _pow2(int(nb[:, 3].max(initial=0))))
        self._net_crop[1] = max(self._net_crop[1],
                                _pow2(int(nb[:, 2].max(initial=0))))
        sw_th_dev = swt_line_stats(dt_dev, jnp.asarray(sb),
                                   crop_h=self._swt_crop[0],
                                   crop_w=self._swt_crop[1])
        sums_dev = net_prob_sums(prob_dev, jnp.asarray(nb),
                                 crop_h=self._net_crop[0],
                                 crop_w=self._net_crop[1])

        def materialize():
            sums = np.asarray(sums_dev, np.float64)[:n]
            denom = nb[:n, 2].astype(np.float64) * nb[:n, 3] * 255.0
            netp = np.where((nb[:n, 2] > 0) & (nb[:n, 3] > 0),
                            sums / np.where(denom != 0, denom, 1.0), 0.0)
            sw_th = np.array(sw_th_dev)[:n]
            netp[~valid] = 0.0
            sw_th[~valid] = 0.0
            return netp, sw_th
        return materialize

    def __call__(self, dt_dev, prob_dev, swt_boxes, net_boxes):
        return self.dispatch(dt_dev, prob_dev, swt_boxes, net_boxes)()
