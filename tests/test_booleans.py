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


# ------------------------------------------------- exact clipper properties

def _star_polygon(rng, cx, cy, r_min, r_max, n_min=5, n_max=10, integer=True):
    """Random star-shaped simple polygon. Angular gaps are kept < 180 deg
    (gap fractions from uniform(0.3, 1.0), n >= 5), which guarantees each
    chord stays inside its convex angular wedge, hence simplicity."""
    n = rng.randint(n_min, n_max + 1)
    gaps = rng.uniform(0.3, 1.0, n)
    angles = np.cumsum(gaps) / gaps.sum() * 2 * np.pi
    radii = rng.uniform(r_min, r_max, n)
    pts = [(cx + r * np.cos(a), cy + r * np.sin(a))
           for a, r in zip(angles, radii)]
    if integer:
        pts = [(round(x), round(y)) for x, y in pts]
        # integer rounding can create duplicates; drop them
        out = []
        for p in pts:
            if not out or p != out[-1]:
                out.append(p)
        pts = out
    return pts if len(pts) >= 3 else rect(cx - 5, cy - 5, cx + 5, cy + 5)


def test_exact_difference_matches_raster_oracle_100_random():
    """Exact slab-sweep difference vs the 1-px raster oracle: the two masks
    may disagree only in a 1-px band around the result boundary (VERDICT
    done-condition: <= 1 px Hausdorff between the methods)."""
    import scipy.ndimage as ndi
    from citlab_as_tpu.geometry.booleans import (
        _rings_bbox, polygon_difference_raster)

    rng = np.random.RandomState(42)
    checked = 0
    for case in range(100):
        a = [_star_polygon(rng, 50, 50, 15, 45)]
        b = [_star_polygon(rng, rng.randint(30, 70), rng.randint(30, 70),
                           10, 35)]
        exact = polygon_difference(a, b)
        x0, y0, x1, y1 = _rings_bbox([a])
        shape = (y1 - y0 + 1, x1 - x0 + 1)
        mask_raster = rasterize_rings(a, (x0, y0), shape) \
            & ~rasterize_rings(b, (x0, y0), shape)
        mask_exact = np.zeros(shape, bool)
        for poly in exact:
            mask_exact ^= rasterize_rings(poly, (x0, y0), shape)
        mismatch = mask_exact ^ mask_raster
        if not mismatch.any():
            checked += 1
            continue
        # every mismatching pixel must touch the boundary of the union
        union = mask_exact | mask_raster
        boundary = union & ~ndi.binary_erosion(union, np.ones((3, 3)))
        band = ndi.binary_dilation(boundary, np.ones((3, 3)))
        assert (mismatch & ~band).sum() == 0, f"case {case}: interior disagreement"
        checked += 1
    assert checked == 100


def test_exact_boolean_self_consistency_random():
    """area(A) == area(A-B) + area(A&B) and difference results are disjoint
    from B, for random star polygons."""
    from citlab_as_tpu.geometry.booleans import polygon_area
    from citlab_as_tpu.geometry.clipping import boolean_area

    rng = np.random.RandomState(7)
    for _ in range(50):
        a = [_star_polygon(rng, 0, 0, 10, 40, integer=False)]
        b = [_star_polygon(rng, rng.uniform(-20, 20), rng.uniform(-20, 20),
                           8, 30, integer=False)]
        area_a = polygon_area(a)
        diff = boolean_area(a, b, "difference")
        inter = boolean_area(a, b, "intersection")
        union = boolean_area(a, b, "union")
        xor = boolean_area(a, b, "xor")
        assert diff >= -1e-9 and inter >= -1e-9
        np.testing.assert_allclose(diff + inter, area_a, atol=1e-6)
        np.testing.assert_allclose(union - inter, xor, atol=1e-6)
        # pieces of A-B are disjoint from B's interior
        for poly in polygon_difference(a, b):
            np.testing.assert_allclose(
                boolean_area(poly, b, "intersection"), 0.0, atol=1e-6)


def test_exact_difference_creates_hole():
    outer = [rect(0, 0, 100, 100)]
    inner = [rect(40, 40, 60, 60)]
    out = polygon_difference(outer, inner)
    assert len(out) == 1
    assert len(out[0]) == 2  # exterior + hole
    from citlab_as_tpu.geometry.booleans import polygon_area
    np.testing.assert_allclose(polygon_area(out[0]), 10000 - 400)


def test_exact_difference_shared_edges_degenerate():
    # B shares A's right edge exactly (pixel-aligned degeneracy)
    a = [rect(0, 0, 10, 10)]
    b = [rect(5, 0, 10, 10)]
    out = polygon_difference(a, b)
    assert len(out) == 1
    from citlab_as_tpu.geometry.booleans import polygon_area
    np.testing.assert_allclose(polygon_area(out[0]), 50)
    # identical polygons -> empty difference
    assert polygon_difference(a, [list(a[0])]) == []


def test_exact_difference_single_vertex_tangency():
    """Clip rings touching the subject (and each other) at single lattice
    vertices — the junction case _pick_leftmost resolves (ADVICE r2 #4).
    The result must reproduce the raster truth exactly away from the 1-px
    boundary band, conserve area, and stay a valid ring decomposition."""
    from citlab_as_tpu.geometry.booleans import _rings_bbox, polygon_area
    from citlab_as_tpu.geometry.clipping import boolean_area

    a = [[(0, 0), (20, 0), (20, 20), (0, 20)]]
    # two clip squares meeting at (10, 10) — checkerboard pinch
    b = [[(4, 4), (10, 4), (10, 10), (4, 10)],
         [(10, 10), (16, 10), (16, 16), (10, 16)]]
    exact = polygon_difference(a, b)
    # area conservation: 400 - 36 - 36
    total = sum(polygon_area(p) for p in exact)
    assert abs(total - 328.0) < 1e-9
    assert abs(boolean_area(a, b, "difference") - 328.0) < 1e-9
    # pixel-exact against the raster mask (all edges lattice-aligned)
    x0, y0, x1, y1 = _rings_bbox([a])
    shape = (y1 - y0 + 1, x1 - x0 + 1)
    mask_raster = rasterize_rings(a, (x0, y0), shape) \
        & ~rasterize_rings(b, (x0, y0), shape)
    mask_exact = np.zeros(shape, bool)
    for poly in exact:
        mask_exact ^= rasterize_rings(poly, (x0, y0), shape)
    assert (mask_exact == mask_raster).all()
    # rings are OPEN (module convention); no degenerate or repeated
    # directed edges, including the closing wrap-around edge
    for poly in exact:
        for ring in poly:
            assert len(ring) >= 3
            seen = set()
            for p, q in zip(ring, ring[1:] + ring[:1]):
                assert p != q
                assert (p, q) not in seen
                seen.add((p, q))
