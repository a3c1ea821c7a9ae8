"""Jittable geometry kernels over padded [N, P, 2] baseline tensors.

STATUS: experimental, not wired into the pipeline. The production baseline
clustering (stages/baseline_clustering.py) uses the host/C++ kernels because
(a) their order-dependent running-minimum shortcut is part of the
reference's observable semantics (bit-parity goal) while this kernel returns
the true minimum, and (b) per-page baseline sets (~10^2 polys) are too small
to amortize a device round trip. Kept for bulk offline analyses over many
pages at once (vmap/pjit).

Device counterparts of the host pairwise kernels (SURVEY step 1b): interline
distances and regression angles as pure vectorized JAX — batched over pages
with vmap, sharded over chips with pjit. One deliberate semantic difference,
documented: the host/Java loop's running-minimum bbox skip is an
order-dependent shortcut that can SKIP qualifying candidate points, so the
host result is an upper bound of the true minimum; the device kernel
evaluates the full O(N^2 P^2) candidate set (cheap on the MXU/VPU) and
returns the true minimum. Golden tests assert device <= host with equality
in the typical case.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.geometry.polygon import Polygon


def pack_polys(polys: Sequence[Polygon], max_points: int = 0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Polygons -> (points [N, P, 2] float32, mask [N, P] bool)."""
    if not polys:
        return np.zeros((0, 1, 2), np.float32), np.zeros((0, 1), bool)
    p = max(max_points, max(poly.n_points for poly in polys))
    pts = np.zeros((len(polys), p, 2), np.float32)
    mask = np.zeros((len(polys), p), bool)
    for i, poly in enumerate(polys):
        arr = poly.to_array()
        pts[i, :len(arr)] = arr
        mask[i, :len(arr)] = True
    return pts, mask


@jax.jit
def regression_angles(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Baseline orientation angles [N] via least squares on (x, -y) with the
    reference's quadrant fixups (polygon.py:271-319), vectorized over
    polygons. Degenerate cases (x-range < 2, tiny determinant, <= 2 points)
    resolve to the same branches as the host implementation."""
    x = points[..., 0]
    y = -points[..., 1]
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(axis=1), 1.0)

    sx = (x * m).sum(axis=1)
    sy = (y * m).sum(axis=1)
    sxx = (x * x * m).sum(axis=1)
    sxy = (x * y * m).sum(axis=1)
    det = n * sxx - sx * sx
    slope = jnp.where(det >= 1e-9, (n * sxy - sx * sy) / jnp.maximum(det, 1e-30), 0.0)

    big = jnp.float32(1e9)
    x_masked_min = jnp.where(mask, x, big).min(axis=1)
    x_masked_max = jnp.where(mask, x, -big).max(axis=1)
    x_range = x_masked_max - x_masked_min

    # two-point polygons: direct slope
    last_idx = jnp.maximum(m.sum(axis=1).astype(jnp.int32) - 1, 0)
    x_first = x[:, 0]
    y_first = y[:, 0]
    x_last = jnp.take_along_axis(x, last_idx[:, None], axis=1)[:, 0]
    y_last = jnp.take_along_axis(y, last_idx[:, None], axis=1)[:, 0]
    two_pt = m.sum(axis=1) == 2
    dx2 = x_last - x_first
    slope2 = jnp.where(dx2 != 0, (y_last - y_first) / jnp.where(dx2 != 0, dx2, 1.0), 0.0)
    inf2 = dx2 == 0

    slope = jnp.where(two_pt, slope2, slope)
    inf_slope = jnp.where(two_pt, inf2, (x_range < 2) | (det < 1e-9))

    angle = jnp.where(inf_slope, jnp.pi / 2, jnp.arctan(slope))

    yi_first = points[:, 0, 1]
    yi_last = jnp.take_along_axis(points[..., 1], last_idx[:, None], axis=1)[:, 0]
    xi_first = points[:, 0, 0]
    xi_last = jnp.take_along_axis(points[..., 0], last_idx[:, None], axis=1)[:, 0]

    angle = jnp.where(
        (angle > -jnp.pi / 2) & (angle <= -jnp.pi / 4) & (yi_first > yi_last),
        angle + jnp.pi, angle)
    angle = jnp.where(
        (angle > -jnp.pi / 4) & (angle <= jnp.pi / 4) & (xi_first > xi_last),
        angle + jnp.pi, angle)
    angle = jnp.where(
        (angle > jnp.pi / 4) & (angle < jnp.pi / 2) & (yi_first < yi_last),
        angle + jnp.pi, angle)
    angle = jnp.where(angle < 0, angle + 2 * jnp.pi, angle)
    # single-point polygons -> 0
    return jnp.where(m.sum(axis=1) <= 1, 0.0, angle)


@partial(jax.jit, static_argnames=())
def min_perpendicular_distances_device(points: jnp.ndarray, mask: jnp.ndarray,
                                       tick_dist: float, max_d: float
                                       ) -> jnp.ndarray:
    """True min |offline distance| per polygon over all other polygons'
    points within the inline gate (the full candidate set — see module doc).

    points [N, P, 2] float, mask [N, P] bool; returns [N] float32.
    """
    n = points.shape[0]
    angles = regression_angles(points, mask)
    ox = jnp.cos(angles)
    oy = jnp.sin(angles)

    m = mask.astype(jnp.float32)
    last_idx = jnp.maximum(m.sum(axis=1).astype(jnp.int32) - 1, 0)
    first = points[:, 0, :]
    last = jnp.take_along_axis(points, last_idx[:, None, None].repeat(2, 2), axis=1)[:, 0, :]

    def in_dist(p1, p2, ox_, oy_):
        return (p1[..., 0] - p2[..., 0]) * ox_ + (-p1[..., 1] + p2[..., 1]) * oy_

    # endpoint straddle gate [N, N]
    d11 = in_dist(first[:, None], first[None, :], ox[:, None], oy[:, None])
    d12 = in_dist(first[:, None], last[None, :], ox[:, None], oy[:, None])
    d21 = in_dist(last[:, None], first[None, :], ox[:, None], oy[:, None])
    d22 = in_dist(last[:, None], last[None, :], ox[:, None], oy[:, None])
    all_neg = (d11 < 0) & (d12 < 0) & (d21 < 0) & (d22 < 0)
    all_pos = (d11 > 0) & (d12 > 0) & (d21 > 0) & (d22 > 0)
    gate = ~(all_neg | all_pos)
    gate = gate & ~jnp.eye(n, dtype=bool)

    # full candidate tensor [N, Pa, N, Pb]
    pa = points[:, :, None, None, :]
    pb = points[None, None, :, :, :]
    dx = pa[..., 0] - pb[..., 0]
    dy = -pa[..., 1] + pb[..., 1]
    ind = dx * ox[:, None, None, None] + dy * oy[:, None, None, None]
    offd = jnp.abs(dx * oy[:, None, None, None] - dy * ox[:, None, None, None])

    elig = (jnp.abs(ind) <= 2.0 * tick_dist)
    elig = elig & mask[:, :, None, None] & mask[None, None, :, :]
    elig = elig & gate[:, None, :, None]

    offd = jnp.where(elig, offd, jnp.inf)
    return jnp.minimum(offd.min(axis=(1, 2, 3)), max_d)


def interline_distances_device(polys: Sequence[Polygon], des_dist: int = 5,
                               max_d: int = 500) -> List[float]:
    """Device interline distances for already-normed polygons."""
    if not polys:
        return []
    points, mask = pack_polys(polys)
    out = min_perpendicular_distances_device(
        jnp.asarray(points), jnp.asarray(mask), float(des_dist), float(max_d))
    return np.asarray(out).tolist()
