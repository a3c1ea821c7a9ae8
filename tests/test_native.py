"""Native C++ geometry kernel: bit-parity vs the numpy implementations
(the dual-implementation cross-check the reference ran between Java and
Python)."""
import numpy as np
import pytest

from citlab_as_tpu.geometry.native import (
    calc_metric_native, calc_tols_native, interline_distances_native,
    native_available,
)
from citlab_as_tpu.geometry.pairwise import min_perpendicular_distances
from citlab_as_tpu.geometry.polygon import Polygon, norm_poly_dists
from tests.oracles import calc_tols_loop, interline_distances_loop

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native kernel not built")


def _make_baselines(rng, n_lines=10, page_w=1000, line_h=60, jitter=10):
    polys = []
    for i in range(n_lines):
        y = 50 + i * line_h + rng.randint(-jitter, jitter)
        x0 = rng.randint(0, 100)
        x1 = page_w - rng.randint(0, 300)
        polys.append(Polygon([x0, (x0 + x1) // 2, x1],
                             [y, y + rng.randint(-3, 4), y]))
    return polys


@pytest.mark.parametrize("seed", [0, 1, 2, 5, 9])
def test_interline_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    polys = _make_baselines(rng)
    normed = norm_poly_dists(polys, des_dist=5)
    native = interline_distances_native(normed, 5, 500)
    loop = interline_distances_loop(normed, des_dist=5, max_d=500)
    assert np.allclose(native, loop, rtol=0, atol=1e-9), (native, loop)
    vec = min_perpendicular_distances(normed, 5, 500)
    assert np.allclose(native, vec, rtol=0, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 3])
def test_tols_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    polys = _make_baselines(rng, n_lines=8)
    normed = norm_poly_dists(polys, des_dist=5)
    native = calc_tols_native(normed, 5, 250, 0.25)
    loop = calc_tols_loop(normed, tick_dist=5, max_d=250, rel_tol=0.25)
    assert np.allclose(native, loop, rtol=0, atol=1e-9)


def test_calc_metric_native_matches_python():
    rng = np.random.RandomState(7)
    truth = _make_baselines(rng, n_lines=6)
    reco = [Polygon([x + rng.randint(-3, 4) for x in p.x_points],
                    [y + rng.randint(-3, 4) for y in p.y_points])
            for p in truth]
    tols = np.arange(10, 31).astype(float)

    native = calc_metric_native(truth, reco, tols, 5, 0.25)
    assert native is not None
    precision_n, recall_n = native

    from citlab_as_tpu.eval.measure import BaselineMeasureEval
    ev = BaselineMeasureEval(min_tol=10, max_tol=30, rel_tol=0.25, poly_tick_dist=5)
    ev.calc_measure_for_page_baseline_polys(truth, reco, use_native=False)
    precision_p = ev.measure.result.page_wise_per_dist_tol_tick_per_line_precision[-1]
    recall_p = ev.measure.result.page_wise_per_dist_tol_tick_per_line_recall[-1]

    assert np.allclose(precision_n, precision_p, rtol=0, atol=1e-9)
    assert np.allclose(recall_n, recall_p, rtol=0, atol=1e-9)


def test_calc_metric_native_dynamic_tols():
    rng = np.random.RandomState(11)
    truth = _make_baselines(rng, n_lines=5)
    reco = list(truth)
    tols = np.array([-1.0])
    precision_n, recall_n = calc_metric_native(truth, reco, tols, 5, 0.25)

    from citlab_as_tpu.eval.measure import BaselineMeasureEval
    ev = BaselineMeasureEval(min_tol=-1, max_tol=-1, rel_tol=0.25, poly_tick_dist=5)
    ev.calc_measure_for_page_baseline_polys(truth, reco, use_native=False)
    precision_p = ev.measure.result.page_wise_per_dist_tol_tick_per_line_precision[-1]
    recall_p = ev.measure.result.page_wise_per_dist_tol_tick_per_line_recall[-1]
    assert np.allclose(precision_n, precision_p, rtol=0, atol=1e-9)
    assert np.allclose(recall_n, recall_p, rtol=0, atol=1e-9)


def test_native_speedup_sanity():
    """Native must handle a page-sized workload quickly (smoke perf check)."""
    import time
    rng = np.random.RandomState(0)
    polys = _make_baselines(rng, n_lines=120, line_h=20, jitter=3)
    normed = norm_poly_dists(polys, des_dist=5)
    t0 = time.perf_counter()
    interline_distances_native(normed, 5, 500)
    native_t = time.perf_counter() - t0
    assert native_t < 1.0  # typically ~ms


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_norm_poly_dists_native_matches_python(seed):
    """gk_norm_poly_dists == numpy blow_up+thin_out on random polylines,
    including the huge-bbox degenerate guard."""
    from citlab_as_tpu.geometry.native import norm_poly_dists_native
    from citlab_as_tpu.geometry.polygon import Polygon, blow_up, thin_out

    rng = np.random.RandomState(seed)
    polys = []
    for _ in range(60):
        n = rng.randint(2, 12)
        xs = np.sort(rng.randint(0, 1200, n))
        ys = rng.randint(0, 1800, n)
        polys.append(Polygon(xs.tolist(), ys.tolist()))
    polys.append(Polygon([0, 200000], [0, 5]))  # huge-bbox guard case

    native = norm_poly_dists_native(polys, 5)
    if native is None:
        pytest.skip("native kernel unavailable")
    for poly, got in zip(polys, native):
        bb = poly.get_bounding_box()
        src = Polygon([0], [0], 1) if (bb.width > 100000
                                       or bb.height > 100000) else poly
        want = thin_out(blow_up(src), 5)
        assert got.x_points == want.x_points
        assert got.y_points == want.y_points


def test_norm_poly_dists_dispatch_threshold():
    """norm_poly_dists uses the C kernel for lists >= 32 and stays
    bit-identical to the numpy path either way."""
    from citlab_as_tpu.geometry.polygon import Polygon, norm_poly_dists

    rng = np.random.RandomState(3)
    polys = [Polygon(np.sort(rng.randint(0, 500, 6)).tolist(),
                     rng.randint(0, 700, 6).tolist()) for _ in range(40)]
    long_run = norm_poly_dists(polys, 5)
    per_poly = [norm_poly_dists([p], 5)[0] for p in polys]   # numpy path
    for a, b in zip(long_run, per_poly):
        assert a.x_points == b.x_points and a.y_points == b.y_points


# ------------------------------------------------------------- delaunay
def _delaunay_invariants(pts, tris):
    """CCW orientation, convex-hull area coverage, Euler count, and the
    empirical in-circle property — together these pin a valid Delaunay
    triangulation without requiring qhull's tie-breaking."""
    from scipy.spatial import ConvexHull

    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    cross = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
             - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    assert (cross > 0).all()
    uniq = np.unique(pts, axis=0)
    hull = ConvexHull(uniq)
    hv = uniq[hull.vertices]
    shoelace = 0.5 * abs(np.dot(hv[:, 0], np.roll(hv[:, 1], -1))
                         - np.dot(hv[:, 1], np.roll(hv[:, 0], -1)))
    assert cross.sum() / 2 == pytest.approx(shoelace, rel=1e-9)
    # Euler: T = 2V - 2 - h with h the boundary-edge count (collinear rim
    # points are triangulation hull vertices even though qhull's ConvexHull
    # drops them, so h cannot come from hull.vertices)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    keys = edges.min(1).astype(np.int64) * len(pts) + edges.max(1)
    _, counts = np.unique(keys, return_counts=True)
    h = int((counts == 1).sum())
    assert tris.shape[0] == 2 * len(uniq) - 2 - h
    # every unique point is a vertex of some triangle
    used = {tuple(p) for p in pts[np.unique(tris)]}
    assert used == {tuple(p) for p in uniq}
    rng = np.random.RandomState(0)
    for t in tris[rng.choice(len(tris), min(25, len(tris)), replace=False)]:
        (ax, ay), (bx, by), (cx, cy) = pts[t]
        d = 2 * ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
        ux = ((bx**2 - ax**2 + by**2 - ay**2) * (cy - ay)
              - (cx**2 - ax**2 + cy**2 - ay**2) * (by - ay)) / d
        uy = ((cx**2 - ax**2 + cy**2 - ay**2) * (bx - ax)
              - (bx**2 - ax**2 + by**2 - ay**2) * (cx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        dist2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = dist2 < r2 * (1 - 1e-9)
        inside[t] = False
        assert not inside.any()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_delaunay_native_random(seed):
    from citlab_as_tpu.geometry.native import delaunay_native

    rng = np.random.RandomState(seed)
    pts = rng.rand(rng.randint(10, 300), 2) * 1000
    tris = delaunay_native(pts)
    if tris is None:
        pytest.skip("native kernel unavailable")
    _delaunay_invariants(pts, tris)


def test_delaunay_native_degenerate_grid_and_dups():
    from citlab_as_tpu.geometry.native import delaunay_native

    xs, ys = np.meshgrid(np.arange(15), np.arange(15))
    grid = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    pts = np.concatenate([grid, grid[::6]])  # cocircular everywhere + dups
    tris = delaunay_native(pts)
    if tris is None:
        pytest.skip("native kernel unavailable")
    _delaunay_invariants(pts, tris)


def test_delaunay_native_rejects_degenerate():
    from citlab_as_tpu.geometry.native import delaunay_native, native_available

    if not native_available():
        pytest.skip("native kernel unavailable")
    line = np.stack([np.arange(40.0), np.zeros(40)], 1)
    assert delaunay_native(line) is None               # collinear
    assert delaunay_native(np.tile([[3.0, 4.0]], (9, 1))) is None  # coincident
    assert delaunay_native(np.zeros((2, 2))) is None   # too few


@pytest.mark.parametrize("seed", [0, 5])
def test_alpha_shape_native_matches_scipy(seed, monkeypatch):
    """On general-position clouds the Delaunay triangulation is unique, so
    the alpha-shape boundary must agree point-for-point (as a cyclic set)
    between the native and scipy triangulations."""
    from citlab_as_tpu.geometry import native as native_mod
    from citlab_as_tpu.geometry.util import alpha_shape

    if not native_mod.native_available():
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(seed)
    # textregion-like ribbon rows with jitter breaking all ties
    rows = [np.stack([np.arange(30) * 50.0 + rng.rand(30),
                      np.full(30, r * 68.0) + rng.rand(30)], 1)
            for r in range(12)]
    pts = np.concatenate(rows)
    b_native = alpha_shape(pts, alpha=75)
    monkeypatch.setattr(native_mod, "get_lib", lambda: None)
    b_scipy = alpha_shape(pts, alpha=75)
    assert {tuple(p) for p in b_native} == {tuple(p) for p in b_scipy}
    assert len(b_native) == len(b_scipy)


@pytest.mark.parametrize("seed", list(range(6)))
def test_alpha_shape_fully_native_exact(seed, monkeypatch):
    """gk_alpha_shape (Delaunay + filter + boundary walk + escalation in
    one C call) vs the Python path ON THE SAME TRIANGULATION: the boundary
    must match EXACTLY (same points, same order) — both paths share the
    sweep-circle triangle set, scan order, and escalation rule."""
    from citlab_as_tpu.geometry import native as native_mod
    from citlab_as_tpu.geometry.util import alpha_shape

    if not native_mod.native_available():
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(seed)
    # article-like clouds at several densities; small alpha values force
    # escalation rounds in some seeds
    n_rows = rng.randint(3, 14)
    rows = [np.stack([np.arange(40) * rng.uniform(20, 60) + rng.rand(40),
                      np.full(40, r * rng.uniform(40, 90)) + rng.rand(40)], 1)
            for r in range(n_rows)]
    pts = np.concatenate(rows)
    for alpha in (30, 75, 200):
        b_native = alpha_shape(pts, alpha=alpha)

        def no_native_alpha(points, a):
            return None
        monkeypatch.setattr(native_mod, "alpha_shape_native", no_native_alpha)
        import citlab_as_tpu.geometry.util as util_mod
        b_python = alpha_shape(pts, alpha=alpha)
        monkeypatch.undo()
        assert b_native == b_python, (seed, alpha, len(b_native),
                                      len(b_python))


def test_alpha_shape_native_small_cloud_exact(monkeypatch):
    """Small clouds route through _alpha_shape_small on the Python side;
    the native path must agree exactly there too."""
    from citlab_as_tpu.geometry import native as native_mod
    from citlab_as_tpu.geometry.util import alpha_shape

    if not native_mod.native_available():
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(3)
    pts = np.stack([rng.rand(24) * 300, rng.rand(24) * 100], 1)
    b_native = alpha_shape(pts, alpha=60)
    monkeypatch.setattr(native_mod, "alpha_shape_native", lambda p, a: None)
    b_python = alpha_shape(pts, alpha=60)
    assert b_native == b_python
