"""Polygon boolean kernel tests (shapely replacement)."""
import numpy as np
import pytest

from citlab_as_tpu.geometry.booleans import (
    ring_area, polygon_area, ring_centroid, point_in_polygon,
    polygons_intersect, polygon_contains, rasterize_rings,
    polygon_difference, polygon_intersection_area,
    split_polyline_outside, polyline_intersects_polygon,
    convert_polygon_with_holes,
)


def rect(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def test_areas():
    assert ring_area(rect(0, 0, 10, 5)) == 50
    assert polygon_area([rect(0, 0, 10, 10), rect(2, 2, 4, 4)]) == 96


def test_centroid():
    cx, cy = ring_centroid(rect(0, 0, 10, 20))
    assert (cx, cy) == (5, 10)


def test_point_in_polygon_with_hole():
    poly = [rect(0, 0, 10, 10), rect(3, 3, 7, 7)]
    assert point_in_polygon((1, 1), poly)
    assert not point_in_polygon((5, 5), poly)  # inside hole
    assert not point_in_polygon((11, 5), poly)


def test_intersects_and_contains():
    a = [rect(0, 0, 10, 10)]
    b = [rect(5, 5, 15, 15)]
    c = [rect(20, 20, 30, 30)]
    d = [rect(2, 2, 8, 8)]
    assert polygons_intersect(a, b)
    assert not polygons_intersect(a, c)
    assert polygon_contains(a, d)
    assert not polygon_contains(a, b)
    # touching boundary counts as intersecting
    e = [rect(10, 0, 20, 10)]
    assert polygons_intersect(a, e)


def test_rasterize_exact_pixels():
    mask = rasterize_rings([rect(2, 3, 7, 9)], (0, 0), (12, 12))
    assert mask.sum() == 5 * 6
    assert mask[3, 2] and mask[8, 6]
    assert not mask[2, 2] and not mask[9, 7]


def test_rasterize_with_hole():
    mask = rasterize_rings([rect(0, 0, 10, 10), rect(3, 3, 7, 7)], (0, 0), (10, 10))
    assert mask.sum() == 100 - 16
    assert not mask[5, 5]


def test_polygon_difference_vertical_split():
    line = [rect(0, 0, 100, 20)]
    sep = [rect(45, -5, 55, 25)]
    parts = polygon_difference(line, sep)
    assert len(parts) == 2
    areas = sorted(polygon_area(p) for p in parts)
    assert all(800 < a < 1000 for a in areas)
    xs_left = [x for x, y in parts[0][0]] + [x for x, y in parts[1][0]]
    assert min(xs_left) <= 1 and max(xs_left) >= 99


def test_polygon_difference_no_overlap():
    parts = polygon_difference([rect(0, 0, 10, 10)], [rect(50, 50, 60, 60)])
    assert len(parts) == 1
    assert abs(polygon_area(parts[0]) - 100) <= 10  # rasterization tolerance


def test_intersection_area():
    a = [rect(0, 0, 10, 10)]
    b = [rect(5, 0, 15, 10)]
    area = polygon_intersection_area(a, b)
    assert 40 <= area <= 60
    assert polygon_intersection_area(a, [rect(50, 50, 60, 60)]) == 0.0


def test_split_polyline_outside():
    sep = [rect(40, -5, 60, 25)]
    baseline = [(0, 10), (100, 10)]
    pieces = split_polyline_outside(baseline, sep)
    assert len(pieces) == 2
    (l1, l2) = sorted(pieces, key=lambda p: p[0][0])
    assert l1[0] == (0, 10) and abs(l1[-1][0] - 40) < 1e-6
    assert abs(l2[0][0] - 60) < 1e-6 and l2[-1] == (100, 10)


def test_split_polyline_fully_outside():
    sep = [rect(40, 0, 60, 5)]
    baseline = [(0, 10), (100, 10)]
    assert not polyline_intersects_polygon(baseline, sep)
    pieces = split_polyline_outside(baseline, sep)
    assert len(pieces) == 1 and len(pieces[0]) >= 2


def test_polyline_intersects():
    sep = [rect(40, -5, 60, 25)]
    assert polyline_intersects_polygon([(0, 10), (100, 10)], sep)
    assert polyline_intersects_polygon([(45, 10), (55, 10)], sep)  # inside
    assert not polyline_intersects_polygon([(0, 50), (100, 50)], sep)


def test_convert_polygon_with_holes():
    annulus = [rect(0, 0, 100, 100), rect(30, 30, 70, 70)]
    parts = convert_polygon_with_holes(annulus, min_hole_area=100)
    assert len(parts) >= 2
    total = sum(ring_area(p) for p in parts)
    assert abs(total - (10000 - 1600)) < 300  # pixel-space tolerance


def test_convert_polygon_small_holes_dropped():
    poly = [rect(0, 0, 100, 100), rect(50, 50, 52, 52)]  # hole area 4 <= 1000
    parts = convert_polygon_with_holes(poly, min_hole_area=1000)
    assert len(parts) == 1
    assert parts[0] == rect(0, 0, 100, 100)
