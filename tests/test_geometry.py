"""Geometry kernel tests: unit semantics + golden parity vs reference-style
loop oracles (the reference's own QA strategy of dual implementations)."""
import math

import numpy as np
import pytest

from citlab_as_tpu.geometry import (
    Polygon, Rectangle, blow_up, thin_out, norm_poly_dists, calc_reg_line_stats,
    string_to_poly, poly_to_string,
)
from citlab_as_tpu.geometry.pairwise import (
    calc_interline_distances, calc_tols, min_perpendicular_distances,
    _sequential_skip_min,
)
from citlab_as_tpu.geometry.util import (
    check_intersection, convex_hull, alpha_shape, polygon_clip, ortho_connect,
    get_dist_fast, get_in_dist, get_off_dist, bounding_box,
    smooth_surrounding_polygon,
)
from citlab_as_tpu.utils.mathutil import round_half_up, round_half_up_array
from tests.oracles import interline_distances_loop, calc_tols_loop


# ---------------------------------------------------------------- rounding
def test_round_half_up_matches_reference_semantics():
    # reference: x % 1 >= 0.5 -> int(x) + 1 else int(x)
    cases = [0.5, 1.5, 2.5, -2.5, -0.5, 0.49999, 1.2, -1.2, 3.0]
    for x in cases:
        ref = int(x) + 1 if x % 1 >= 0.5 else int(x)
        assert round_half_up(x) == ref, x
    arr = np.array(cases)
    assert round_half_up_array(arr).tolist() == [
        int(x) + 1 if x % 1 >= 0.5 else int(x) for x in cases]


# ---------------------------------------------------------------- polygon
def test_blow_up_simple_diagonal():
    p = Polygon([0, 4], [0, 2])
    b = blow_up(p)
    assert b.as_list() == [(0, 0), (1, 1), (2, 1), (3, 2), (4, 2)]


def test_blow_up_steep_segment():
    p = Polygon([0, 2], [0, 4])
    b = blow_up(p)
    assert b.as_list() == [(0, 0), (1, 1), (1, 2), (2, 3), (2, 4)]


def test_blow_up_duplicate_points():
    p = Polygon([0, 0, 3], [0, 0, 0])
    b = blow_up(p)
    assert b.as_list() == [(0, 0), (1, 0), (2, 0), (3, 0)]
    # duplicate at the end still emits the endpoint
    p2 = Polygon([0, 3, 3], [0, 0, 0])
    b2 = blow_up(p2)
    assert b2.as_list()[-1] == (3, 0)


def test_thin_out_short_poly_unchanged():
    p = Polygon(list(range(10)), [0] * 10)
    assert thin_out(p, 5) is p


def test_thin_out_counts():
    p = Polygon(list(range(101)), [0] * 101)  # 101 points, dist = 100
    t = thin_out(p, 5)
    # des_pts = max(20, int(100/5)+1) = 21
    assert t.n_points == 21
    assert t.as_list()[0] == (0, 0)
    assert t.as_list()[-1] == (100, 0)


def test_norm_poly_dists_end_to_end():
    p = Polygon([0, 200], [0, 0])
    normed = norm_poly_dists([p], des_dist=5)[0]
    assert normed.n_points == max(20, int(200 / 5) + 1)
    assert normed.bounds is not None
    # huge-bbox guard
    p_huge = Polygon([0, 200000], [0, 0])
    n_huge = norm_poly_dists([p_huge], des_dist=5)[0]
    assert n_huge.as_list() == [(0, 0)]


def test_calc_reg_line_stats_directions():
    # left-to-right horizontal: angle 0
    angle, _ = calc_reg_line_stats(Polygon([0, 10], [5, 5]))
    assert angle == pytest.approx(0.0)
    # right-to-left horizontal: angle pi
    angle, _ = calc_reg_line_stats(Polygon([10, 0], [5, 5]))
    assert angle == pytest.approx(math.pi)
    # vertical
    angle, _ = calc_reg_line_stats(Polygon([5, 5], [0, 10]))
    assert angle == pytest.approx(math.pi / 2)
    # 45 degrees upward in image coords (y decreasing)
    angle, _ = calc_reg_line_stats(Polygon([0, 10], [10, 0]))
    assert angle == pytest.approx(math.pi / 4)
    # multi-point slight slope
    angle, _ = calc_reg_line_stats(Polygon([0, 5, 10], [0, 1, 2]))
    assert -0.3 < angle - 2 * math.pi < 0 or 0 <= angle < 0.3


def test_poly_string_roundtrip():
    s = "1,2;3,4;5,6"
    assert poly_to_string(string_to_poly(s)) == s
    with pytest.raises(ValueError):
        string_to_poly("1,2")


def test_contains_point():
    sq = Polygon([0, 10, 10, 0], [0, 0, 10, 10])
    assert sq.contains_point((5, 5))
    assert not sq.contains_point((15, 5))
    assert not sq.contains_point((-1, -1))


# ---------------------------------------------------------------- rectangle
def test_rectangle_intersection_and_negative_encoding():
    a = Rectangle(0, 0, 10, 10)
    b = Rectangle(5, 5, 10, 10)
    inter = a.intersection(b)
    assert (inter.x, inter.y, inter.width, inter.height) == (5, 5, 5, 5)
    c = Rectangle(20, 20, 5, 5)
    inter2 = a.intersection(c)
    assert inter2.width < 0 and inter2.height < 0  # empty encoded negative


def test_rectangle_contains():
    r = Rectangle(0, 0, 10, 10)
    assert r.contains_point((5, 5))
    assert not r.contains_point((0, 5))  # boundary excluded
    assert r.contains_point_on_boundary((0, 0))


# ---------------------------------------------------------------- util
def test_check_intersection_cases():
    # crossing
    pt = check_intersection([[0, 10], [0, 10]], [[0, 10], [10, 0]])
    assert pt == pytest.approx([5.0, 5.0])
    # parallel disjoint
    assert check_intersection([[0, 10], [0, 0]], [[0, 10], [1, 1]]) is None
    # collinear overlap
    assert check_intersection([[0, 10], [0, 0]], [[5, 15], [0, 0]]) == ["inf", "inf"]
    # touching at endpoint
    pt = check_intersection([[0, 10], [0, 0]], [[10, 20], [0, 0]])
    assert pt == pytest.approx([10.0, 0.0])
    # no intersection (segments too short)
    assert check_intersection([[0, 1], [0, 1]], [[5, 6], [0, -1]]) is None


def test_convex_hull_square_with_interior():
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (2, 3)]
    hull = convex_hull(pts)
    assert set(hull) == {(0, 0), (10, 0), (10, 10), (0, 10)}


def test_bounding_box():
    assert bounding_box([(1, 2), (5, 1), (3, 7)]) == [(1, 1), (5, 1), (5, 7), (1, 7)]


def test_polygon_clip_square():
    poly = [(0, 0), (20, 0), (20, 20), (0, 20)]
    clip = [(5, 5), (15, 5), (15, 15), (5, 15)]  # CCW in image coords
    # make clip CCW per is_inside convention (left turns positive)
    clipped = polygon_clip(poly, clip)
    assert len(clipped) == 4
    xs = sorted(set(round(p[0]) for p in clipped))
    assert xs == [5, 15]


def test_alpha_shape_square_grid():
    xs, ys = np.meshgrid(np.arange(10), np.arange(10))
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
    boundary = alpha_shape(pts, alpha=2.0)
    assert boundary[0] == boundary[-1]  # closed
    b = np.array(boundary[:-1])
    # all boundary points on the grid edge
    on_edge = (b[:, 0] == 0) | (b[:, 0] == 9) | (b[:, 1] == 0) | (b[:, 1] == 9)
    assert on_edge.all()
    assert len(boundary) - 1 >= 32  # entire rim


def test_alpha_shape_few_points():
    pts = np.array([[0, 0], [5, 0], [0, 5]])
    boundary = alpha_shape(pts, alpha=1.0)
    assert boundary[0] == boundary[-1]
    assert len(boundary) == 4


def test_alpha_shape_escalation_terminates():
    # two distant clusters force escalation until one hull covers both
    rng = np.random.RandomState(0)
    a = rng.rand(20, 2) * 10
    b = rng.rand(20, 2) * 10 + 200
    boundary = alpha_shape(np.concatenate([a, b]), alpha=3.0)
    assert boundary[0] == boundary[-1]
    assert len(boundary) > 3


def test_ortho_connect_two_rects():
    rects = [Rectangle(0, 0, 10, 10), Rectangle(10, 0, 10, 10)]
    polys = ortho_connect(rects)
    assert len(polys) == 1
    assert set(polys[0].as_list()) == {(0, 0), (20, 0), (20, 10), (0, 10)}


def test_ortho_connect_l_shape():
    rects = [Rectangle(0, 0, 10, 10), Rectangle(0, 10, 20, 10)]
    polys = ortho_connect(rects)
    assert len(polys) == 1
    assert len(polys[0].as_list()) == 6


def test_dist_helpers():
    bb = Rectangle(10, 10, 10, 10)
    assert get_dist_fast([0, 0], bb) == 20
    assert get_dist_fast([15, 15], bb) == 0
    assert get_dist_fast([25, 15], bb) == 5
    # horizontal orientation: in = dx, off = -dy(flipped)
    assert get_in_dist((5, 0), (3, 0), 1.0, 0.0) == 2
    assert get_off_dist((0, 5), (0, 3), 1.0, 0.0) == 2


def test_smooth_surrounding_polygon_rectangle_stays_rectangleish():
    # a noisy rectangle outline should smooth to an axis-aligned polygon
    poly = [(0, 0), (200, 3), (400, 0), (400, 200), (398, 400), (200, 401),
            (0, 400), (2, 200)]
    sm = smooth_surrounding_polygon(poly, poly_norm_dist=10)
    assert sm.n_points >= 4
    # all edges axis aligned
    pts = sm.as_list()
    for i in range(len(pts)):
        a, b = pts[i], pts[(i + 1) % len(pts)]
        assert a[0] == b[0] or a[1] == b[1]


# ------------------------------------------------- pairwise kernel parity
def _make_baselines(rng, n_lines=8, page_w=1000, line_h=60, jitter=10):
    polys = []
    for i in range(n_lines):
        y = 50 + i * line_h + rng.randint(-jitter, jitter)
        x0 = rng.randint(0, 100)
        x1 = page_w - rng.randint(0, 300)
        xs = [x0, (x0 + x1) // 2, x1]
        ys = [y, y + rng.randint(-3, 4), y]
        polys.append(Polygon(xs, ys))
    return polys


def test_sequential_skip_min_exact():
    rng = np.random.RandomState(1)
    for _ in range(200):
        n = rng.randint(1, 50)
        D = rng.rand(n) * 100
        C = rng.rand(n) * 100
        max_d = 60.0
        # direct loop
        dist = max_d
        for i in range(n):
            if D[i] > dist:
                continue
            dist = min(dist, C[i])
        assert _sequential_skip_min(D, C, max_d) == pytest.approx(dist, abs=0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_interline_distances_match_reference_loop(seed):
    rng = np.random.RandomState(seed)
    polys = _make_baselines(rng, n_lines=10)
    normed = norm_poly_dists(polys, des_dist=5)
    got = calc_interline_distances(normed, des_dist=5, max_d=500)
    want = interline_distances_loop(normed, des_dist=5, max_d=500)
    assert np.allclose(got, want), (got, want)


@pytest.mark.parametrize("seed", [0, 7])
def test_interline_two_columns(seed):
    rng = np.random.RandomState(seed)
    left = _make_baselines(rng, n_lines=6, page_w=450)
    right = [Polygon([x + 520 for x in p.x_points], list(p.y_points)) for p in
             _make_baselines(rng, n_lines=6, page_w=450)]
    normed = norm_poly_dists(left + right, des_dist=5)
    got = calc_interline_distances(normed, des_dist=5, max_d=500)
    want = interline_distances_loop(normed, des_dist=5, max_d=500)
    assert np.allclose(got, want)


def test_interline_single_poly():
    normed = norm_poly_dists([Polygon([0, 100], [0, 0])], des_dist=5)
    assert calc_interline_distances(normed) == [500.0]


def test_calc_tols_match_reference_loop():
    rng = np.random.RandomState(42)
    polys = _make_baselines(rng, n_lines=9)
    normed = norm_poly_dists(polys, des_dist=5)
    got = calc_tols(normed, tick_dist=5, max_d=250, rel_tol=0.25)
    want = calc_tols_loop(normed, tick_dist=5, max_d=250, rel_tol=0.25)
    assert np.allclose(got, want), (got, want)


def test_calc_tols_isolated_lines_get_mean():
    # two far-apart lines -> no neighbors -> all tols = max_d * rel_tol
    polys = [Polygon([0, 100], [0, 0]), Polygon([0, 100], [5000, 5000])]
    normed = norm_poly_dists(polys, des_dist=5)
    tols = calc_tols(normed, tick_dist=5, max_d=250, rel_tol=0.25)
    assert np.allclose(tols, 250 * 0.25)
