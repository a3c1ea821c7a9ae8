"""ctypes bindings for the native geometry kernel
(native/geometry_kernel.cpp — the java_util/Util.class replacement).

The library is built on demand with ``make -C native`` (g++, no external
deps). All functions fall back to the numpy implementations when the build
is unavailable; results are bit-identical (golden tests cross-check), so the
native path is purely a host-speed optimization — the same dual-
implementation QA strategy the reference used between Java and Python.

Disable with CITLAB_AS_TPU_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from citlab_as_tpu.geometry.polygon import Polygon

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgeometry_kernel.so")

_lib = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.info("Native geometry kernel build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return None
    _load_attempted = True
    from citlab_as_tpu.config import runtime
    if not runtime.get("native_geometry"):
        return None
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("Could not load native geometry kernel: %s", e)
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.gk_interline_distances.argtypes = [
        dp, ip, ctypes.c_int32, ctypes.c_int32, ctypes.c_double, dp]
    lib.gk_interline_distances_normed.argtypes = [
        dp, ip, ctypes.c_int32, ctypes.c_int32, ctypes.c_double, dp]
    lib.gk_calc_tols.argtypes = [
        dp, ip, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_double, dp]
    lib.gk_calc_metric.argtypes = [
        dp, ip, ctypes.c_int32, dp, ip, ctypes.c_int32,
        dp, ctypes.c_int32, ctypes.c_int32, ctypes.c_double, dp, dp]
    lib.gk_norm_poly_sizes.argtypes = [dp, ip, ctypes.c_int32, ctypes.c_int32]
    lib.gk_norm_poly_sizes.restype = ctypes.c_int32
    lib.gk_norm_poly_dists.argtypes = [dp, ip, ctypes.c_int32, ctypes.c_int32, dp, ip]
    lib.gk_delaunay.argtypes = [dp, ctypes.c_int32, ip]
    lib.gk_delaunay.restype = ctypes.c_int32
    lib.gk_alpha_shape.argtypes = [dp, ctypes.c_int32, ctypes.c_double, ip]
    lib.gk_alpha_shape.restype = ctypes.c_int32
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.gk_separator_post.argtypes = [
        u8, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, u8, u8]
    lib.gk_separator_post_packed.argtypes = [
        u8, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8, u8]
    lib.gk_nonzero_u8.argtypes = [u8, ctypes.c_int32, ctypes.c_int32,
                                  ip, ip, ctypes.c_int64]
    lib.gk_nonzero_u8.restype = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gk_line_stats.argtypes = [u8, ctypes.c_int32, ctypes.c_int32,
                                  ip, ctypes.c_int32, ctypes.c_int32, fp]
    lib.gk_cluster_features.argtypes = [
        dp, ip, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_double, dp, dp]
    _lib = lib
    logger.info("Loaded native geometry kernel from %s", _LIB_PATH)
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _pack(polys: Sequence[Polygon]) -> Tuple[np.ndarray, np.ndarray]:
    from itertools import chain

    n = len(polys)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(np.fromiter((p.n_points for p in polys), np.int32, n),
              out=offsets[1:])
    total = int(offsets[-1])
    coords = np.empty((total, 2), np.float64)
    coords[:, 0] = np.fromiter(
        chain.from_iterable(p.x_points for p in polys), np.float64, total)
    coords[:, 1] = np.fromiter(
        chain.from_iterable(p.y_points for p in polys), np.float64, total)
    return coords, offsets


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def interline_distances_native(normed_polys: Sequence[Polygon],
                               des_dist: int, max_d: float) -> Optional[List[float]]:
    lib = get_lib()
    if lib is None or not normed_polys:
        return None
    coords, offsets = _pack(normed_polys)
    out = np.empty(len(normed_polys), np.float64)
    lib.gk_interline_distances_normed(
        _dp(coords), _ip(offsets), len(normed_polys), des_dist,
        float(max_d), _dp(out))
    return out.tolist()


def norm_poly_dists_native(poly_list: Sequence[Polygon],
                           des_dist: int) -> Optional[List[Polygon]]:
    """blow_up + thin_out per polygon in C (gk_norm_poly_dists); returns
    None when the native kernel is unavailable."""
    lib = get_lib()
    if lib is None or not poly_list:
        return None
    coords, offsets = _pack(poly_list)
    total = lib.gk_norm_poly_sizes(_dp(coords), _ip(offsets),
                                   len(poly_list), des_dist)
    out_coords = np.empty((total, 2), np.float64)
    out_offsets = np.empty(len(poly_list) + 1, np.int32)
    lib.gk_norm_poly_dists(_dp(coords), _ip(offsets), len(poly_list),
                           des_dist, _dp(out_coords), _ip(out_offsets))
    res = []
    for i in range(len(poly_list)):
        seg = out_coords[out_offsets[i]:out_offsets[i + 1]]
        poly = Polygon.from_arrays(seg[:, 0].astype(np.int64),
                                   seg[:, 1].astype(np.int64))
        poly.get_bounding_box()
        res.append(poly)
    return res


def norm_poly_dists_packed(poly_list: Sequence[Polygon], des_dist: int
                           ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Packed-array variant of :func:`norm_poly_dists_native`: returns
    (coords [total, 2] float64 of integral values, offsets [n+1] int32)
    without materializing per-polygon Polygon objects — for callers that
    consume the normalized points as arrays (e.g. the textregion stage's
    shifted clouds). None when the kernel is unavailable."""
    lib = get_lib()
    if lib is None or not poly_list:
        return None
    coords, offsets = _pack(poly_list)
    total = lib.gk_norm_poly_sizes(_dp(coords), _ip(offsets),
                                   len(poly_list), des_dist)
    out_coords = np.empty((total, 2), np.float64)
    out_offsets = np.empty(len(poly_list) + 1, np.int32)
    lib.gk_norm_poly_dists(_dp(coords), _ip(offsets), len(poly_list),
                           des_dist, _dp(out_coords), _ip(out_offsets))
    return out_coords, out_offsets


def interline_distances_raw_native(poly_list: Sequence[Polygon],
                                   des_dist: int, max_d: float
                                   ) -> Optional[np.ndarray]:
    """Interline distances straight from RAW polygons (gk_interline_distances
    normalizes internally at ``des_dist``) — one C call instead of
    norm_poly_dists + interline_distances_native."""
    lib = get_lib()
    if lib is None or not poly_list:
        return None
    coords, offsets = _pack(poly_list)
    out = np.empty(len(poly_list), np.float64)
    lib.gk_interline_distances(_dp(coords), _ip(offsets), len(poly_list),
                               int(des_dist), float(max_d), _dp(out))
    return out


def separator_post_native(binary: np.ndarray, min_size: int, h_kernel: int,
                          v_kernel: int, noise_kernel: int
                          ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(horizontal, vertical) separator masks via gk_separator_post — the
    run-space C twin of stages.separator._separator_masks_device (CC filter
    + 1-D openings + saturated subtract + noise opening), bit-identical
    (golden-tested) and ~3x cheaper than even the scipy CC host path. None
    when the native kernel is unavailable."""
    import ctypes as ct

    lib = get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(np.asarray(binary), np.uint8)
    h, w = b.shape
    out_h = np.zeros((h, w), np.uint8)
    out_v = np.zeros((h, w), np.uint8)
    u8 = ct.POINTER(ct.c_uint8)
    lib.gk_separator_post(
        b.ctypes.data_as(u8), h, w, int(min_size), int(h_kernel),
        int(v_kernel), int(noise_kernel),
        out_h.ctypes.data_as(u8), out_v.ctypes.data_as(u8))
    return out_h, out_v


def separator_post_native_packed(packed: np.ndarray, width: int,
                                 min_size: int, h_kernel: int, v_kernel: int,
                                 noise_kernel: int
                                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Bit-packed variant of :func:`separator_post_native`: ``packed`` is
    the device's np.packbits(mask, axis=1) readback ([H, ceil(W/8)] uint8,
    MSB-first) — the dense binary mask is never materialized on the host
    (the C kernel scans bit rows directly, short-circuiting zero bytes)."""
    import ctypes as ct

    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(np.asarray(packed), np.uint8)
    h, stride = p.shape
    out_h = np.zeros((h, width), np.uint8)
    out_v = np.zeros((h, width), np.uint8)
    u8 = ct.POINTER(ct.c_uint8)
    lib.gk_separator_post_packed(
        p.ctypes.data_as(u8), h, int(width), stride, int(min_size),
        int(h_kernel), int(v_kernel), int(noise_kernel),
        out_h.ctypes.data_as(u8), out_v.ctypes.data_as(u8))
    return out_h, out_v


def nonzero2d_native(mask: np.ndarray,
                     count: Optional[int] = None
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(rows, cols) int32 of a 2-D uint8/bool mask in row-major order —
    np.nonzero twin (~8x faster on the full-page contour masks; None when
    the kernel is unavailable). ``count`` skips the np.count_nonzero sizing
    pass when the caller already knows it."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(np.asarray(mask))
    if m.dtype == np.bool_:
        m = m.view(np.uint8)
    elif m.dtype != np.uint8:
        return None
    h, w = m.shape
    n = int(np.count_nonzero(m)) if count is None else int(count)
    rows = np.empty(n, np.int32)
    cols = np.empty(n, np.int32)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    got = lib.gk_nonzero_u8(m.ctypes.data_as(u8), h, w,
                            _ip(rows), _ip(cols), n)
    if got != n:          # count raced a caller mutation; fall back
        return None
    return rows, cols


def cluster_features_native(polys: Sequence[Polygon], des_dist: int,
                            max_d: float, target_avg: float
                            ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(interline distances [N], normed bboxes [N, 4] x/y/w/h) for the
    baseline-clustering stage in ONE C call (gk_cluster_features) — the
    normalize -> measure -> rescale-to-target -> re-normalize -> re-measure
    chain of DBSCANBaselines.__init__ without materializing any intermediate
    Polygon. None when the kernel is unavailable."""
    lib = get_lib()
    if lib is None or not polys:
        return None
    coords, offsets = _pack(polys)
    n = len(polys)
    out_d = np.empty(n, np.float64)
    out_bb = np.empty((n, 4), np.float64)
    lib.gk_cluster_features(_dp(coords), _ip(offsets), n, int(des_dist),
                            float(max_d), float(target_avg),
                            _dp(out_d), _dp(out_bb))
    return out_d, out_bb


def line_stats_native(dt: np.ndarray, boxes: np.ndarray,
                      clean_ccs: int = 2) -> Optional[np.ndarray]:
    """[L, 2] float32 (stroke_width, text_height) per line bbox via
    gk_line_stats — the host-native twin of the device per-line SWT
    feature program (ops/swt_device.py), with
    StrokeWidthDistanceTransform.textline_features semantics
    (heading_net_post_processor.py:218-245). ``dt`` [H, W] uint8,
    ``boxes`` [L, 4] int32 (x, y, w, h); rows with w<0 or h<0 yield
    zeros. None when the kernel is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(np.asarray(dt), np.uint8)
    b = np.ascontiguousarray(np.asarray(boxes), np.int32)
    if b.ndim != 2 or b.shape[1] != 4:
        raise ValueError("boxes must be [L, 4]")
    out = np.zeros((len(b), 2), np.float32)
    h, w = d.shape
    u8 = ctypes.POINTER(ctypes.c_uint8)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.gk_line_stats(d.ctypes.data_as(u8), h, w, _ip(b), len(b),
                      int(clean_ccs), out.ctypes.data_as(fp))
    return out


def delaunay_native(points: np.ndarray) -> Optional[np.ndarray]:
    """Delaunay triangle ids [T, 3] via the native sweep-circle kernel
    (gk_delaunay); None when the kernel is unavailable or the input is
    degenerate (callers then fall back to scipy/qhull). ~20x faster than
    qhull on the textregion stage's ~900-point article clouds."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(np.asarray(points, np.float64))
    n = pts.shape[0]
    if n < 3:
        return None
    out = np.empty((2 * n, 3), np.int32)
    n_tris = lib.gk_delaunay(_dp(pts), n, _ip(out))
    if n_tris < 0:
        return None
    return out[:n_tris]


def alpha_shape_native(points: np.ndarray,
                       alpha: float) -> Optional[np.ndarray]:
    """Boundary vertex INDICES (circle order, not closed) of the alpha
    shape via gk_alpha_shape — the native twin of geometry/util.alpha_shape
    incl. the 20% escalation (reference util.py:568-697). None when the
    kernel is unavailable or the triangulation/escalation degenerates
    (callers fall back to the Python paths)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(np.asarray(points, np.float64))
    n = pts.shape[0]
    if pts.ndim != 2 or pts.shape[1] != 2 or n < 4:
        return None
    out = np.empty(6 * n + 8, np.int32)
    m = lib.gk_alpha_shape(_dp(pts), n, float(alpha), _ip(out))
    if m < 0:
        return None
    return out[:m].copy()


def calc_tols_native(normed_polys: Sequence[Polygon], tick_dist: int,
                     max_d: float, rel_tol: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None or not normed_polys:
        return None
    coords, offsets = _pack(normed_polys)
    out = np.empty(len(normed_polys), np.float64)
    lib.gk_calc_tols(_dp(coords), _ip(offsets), len(normed_polys),
                     tick_dist, float(max_d), float(rel_tol), _dp(out))
    return out


def calc_metric_native(polys_truth: Sequence[Polygon],
                       polys_reco: Sequence[Polygon],
                       tols: np.ndarray, tick_dist: int, rel_tol: float
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(precision [n_tols, n_reco], recall [n_tols, n_truth]) for RAW polys
    (the Java calcMetricForPageBaseLinePolys fast path)."""
    lib = get_lib()
    if lib is None or not polys_truth or not polys_reco:
        return None
    t_coords, t_offsets = _pack(polys_truth)
    r_coords, r_offsets = _pack(polys_reco)
    tols = np.ascontiguousarray(np.asarray(tols, np.float64))
    n_tols = len(tols)
    precision = np.empty((n_tols, len(polys_reco)), np.float64)
    recall = np.empty((n_tols, len(polys_truth)), np.float64)
    lib.gk_calc_metric(
        _dp(t_coords), _ip(t_offsets), len(polys_truth),
        _dp(r_coords), _ip(r_offsets), len(polys_reco),
        _dp(tols), n_tols, tick_dist, float(rel_tol),
        _dp(precision), _dp(recall))
    return precision, recall
