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
