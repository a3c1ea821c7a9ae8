"""Baseline clustering (DBSCAN) + text region generation stage tests."""
import numpy as np
import pytest

from citlab_as_tpu.geometry.polygon import Polygon
from citlab_as_tpu.pagexml import Page
from citlab_as_tpu.stages.baseline_clustering import (
    DBSCANBaselines, cluster_baselines_dbscan, cluster_page,
    get_list_of_scaled_polygons,
)
from citlab_as_tpu.stages.textregion import (
    create_text_regions, generate_text_regions_for_page,
)


def _column(x0, x1, y0, n, dy):
    return [Polygon([x0, x1], [y0 + i * dy, y0 + i * dy]) for i in range(n)]


def test_scaled_polygons_truncate():
    p = Polygon([0, 99], [0, 99])
    (s,) = get_list_of_scaled_polygons([p], 0.505)
    assert s.x_points == [0, 49]  # 49.995 truncated


def test_two_columns_two_clusters():
    left = _column(50, 400, 100, 8, 60)
    right = _column(600, 950, 100, 8, 60)
    labels = cluster_baselines_dbscan(left + right)
    left_labels = set(labels[:8])
    right_labels = set(labels[8:])
    assert len(left_labels) == 1 and len(right_labels) == 1
    assert left_labels != right_labels


def test_vertical_gap_splits_cluster():
    top = _column(50, 400, 100, 5, 60)
    bottom = _column(50, 400, 1500, 5, 60)  # far below
    labels = cluster_baselines_dbscan(top + bottom)
    assert set(labels[:5]) != set(labels[5:])
    assert len(set(labels)) == 2


def test_noise_becomes_singleton_articles():
    col = _column(50, 400, 100, 6, 60)
    loner = Polygon([50, 400], [5000, 5000])
    labels = cluster_baselines_dbscan(col + [loner])
    assert len(set(labels[:6])) == 1
    assert labels[6] not in set(labels[:6])


def test_min_polygons_for_article():
    col = _column(50, 400, 100, 6, 60)
    loner = Polygon([50, 400], [5000, 5000])
    labels = cluster_baselines_dbscan(
        col + [loner], min_polygons_for_article=2)
    assert labels[6] == -1  # noise stays noise


def test_fused_cluster_features_matches_stepwise():
    """The one-call native feature pass (gk_cluster_features) reproduces the
    stepwise chain (norm -> interline -> rescale -> re-norm -> re-measure)
    exactly: same distances, same bboxes, same final labels — on a fabricated
    page with mixed line lengths, a degenerate loner and a sloped baseline."""
    from citlab_as_tpu.geometry.native import (
        cluster_features_native, native_available)
    from citlab_as_tpu.geometry.polygon import norm_poly_dists
    from citlab_as_tpu.stages.baseline_clustering import (
        get_list_of_interline_distances)
    if not native_available():
        pytest.skip("native kernel unavailable")
    polys = (_column(50, 400, 100, 6, 47)
             + _column(600, 950, 90, 5, 63)
             + [Polygon([100, 300, 500], [2000, 2010, 2005]),
                Polygon([700, 710], [2500, 2500])])
    d_f, bb_f = cluster_features_native(polys, 5, 500, 50)

    d0 = get_list_of_interline_distances(polys, des_dist=5, max_d=500)
    pos = [d for d in d0 if d > 0]
    from citlab_as_tpu.stages.baseline_clustering import (
        get_list_of_scaled_polygons)
    scaled = get_list_of_scaled_polygons(polys, 50 / (sum(pos) / len(pos)))
    d1 = get_list_of_interline_distances(scaled, des_dist=5, max_d=500)
    np.testing.assert_array_equal(d_f, d1)
    normed = norm_poly_dists(scaled, des_dist=5)
    for i, p in enumerate(normed):
        b = p.get_bounding_box()
        assert tuple(bb_f[i]) == (b.x, b.y, b.width, b.height)

    obj = DBSCANBaselines(polys)
    assert obj._bboxes is not None   # fused path actually taken
    obj.clustering_polygons()
    labels_fast = obj.get_cluster_of_polygons()

    import citlab_as_tpu.geometry.native as gn
    saved = (gn._lib, gn._load_attempted)
    gn._lib, gn._load_attempted = None, True
    try:
        obj2 = DBSCANBaselines(polys)
        assert obj2._bboxes is None  # fallback path
        obj2.clustering_polygons()
        labels_slow = obj2.get_cluster_of_polygons()
    finally:
        gn._lib, gn._load_attempted = saved
    assert labels_fast == labels_slow


def test_dbscan_object_centers():
    col = _column(50, 400, 100, 6, 60)
    obj = DBSCANBaselines(col)
    obj.clustering_polygons()
    labels = obj.get_cluster_of_polygons()
    assert len(set(labels)) == 1
    assert any(obj.list_if_center)


PAGE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="p.png" imageWidth="1000" imageHeight="1200">
    <TextRegion id="tr_old" type="paragraph">
      <Coords points="0,0 1000,0 1000,1200 0,1200"/>
      {lines}
    </TextRegion>
  </Page>
</PcGts>
"""

LINE_TPL = """<TextLine id="tl_{i}">
  <Coords points="{x0},{yt} {x1},{yt} {x1},{yb} {x0},{yb}"/>
  <Baseline points="{x0},{y} {x1},{y}"/>
  <TextEquiv><Unicode>line {i}</Unicode></TextEquiv>
</TextLine>"""


def _write_two_column_page(tmp_path):
    lines = []
    i = 0
    for x0, x1 in ((50, 400), (600, 950)):
        for k in range(6):
            y = 100 + k * 60
            lines.append(LINE_TPL.format(i=i, x0=x0, x1=x1, y=y, yt=y - 40, yb=y + 10))
            i += 1
    p = tmp_path / "page.xml"
    p.write_text(PAGE_XML.format(lines="\n".join(lines)))
    return str(p)


def test_cluster_page_writes_article_ids(tmp_path):
    path = _write_two_column_page(tmp_path)
    labels = cluster_page(path)
    assert len(labels) == 12
    page = Page(path)
    ids = [tl.get_article_id() for tl in page.get_textlines()]
    assert all(a is not None for a in ids)
    assert len(set(ids[:6])) == 1 and len(set(ids[6:])) == 1
    assert set(ids[:6]) != set(ids[6:])


def test_text_region_generation_end_to_end(tmp_path):
    path = _write_two_column_page(tmp_path)
    cluster_page(path)
    region_dict = generate_text_regions_for_page(path, des_dist=50, max_d=100, alpha=75)
    assert len(region_dict) == 2

    page = Page(path)
    regions = page.get_text_regions()
    assert len(regions) == 2
    assert {r.id for r in regions} == set(region_dict.keys())
    for region in regions:
        assert len(region.text_lines) == 6
        # reading order present and increasing with y
        orders = [int(tl.custom["readingOrder"]["index"]) for tl in region.text_lines]
        assert sorted(orders) == list(range(6))
        # boundary contains its lines' baselines
        poly = region.points.to_polygon()
        bb = poly.get_bounding_box()
        for tl in region.text_lines:
            for x, y in tl.baseline.points_list:
                assert bb.x - 5 <= x <= bb.x + bb.width + 5
                assert bb.y - 5 <= y <= bb.y + bb.height + 5


def test_textregion_fast_path_matches_list_path(tmp_path):
    """The packed-array fast path (_create_regions_fast) writes byte-identical
    XML to the original Polygon-list path on a clustered page (same clouds,
    same alpha-shape boundaries, same reading order)."""
    import re
    from citlab_as_tpu.stages import textregion as tr
    from citlab_as_tpu.geometry.native import native_available
    if not native_available():
        pytest.skip("native kernel unavailable")
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    pa = _write_two_column_page(tmp_path / "a")
    pb = _write_two_column_page(tmp_path / "b")
    cluster_page(pa)
    cluster_page(pb)
    rd_fast = tr.generate_text_regions_for_page(pa)
    assert rd_fast  # fast path produced regions
    art, tld = tr.get_data_from_pagexml(pb, des_dist=50, max_d=100)
    rd_old = tr.create_text_regions(art, tld, alpha=75)
    tr.save_results_in_pagexml(pb, rd_old)
    assert set(rd_fast.keys()) == set(rd_old.keys())

    def norm(p):
        return re.sub(rb"<LastChange>[^<]*</LastChange>", b"",
                      open(p, "rb").read())
    assert norm(pa) == norm(pb)


def test_none_article_lines_become_singletons(tmp_path):
    lines = [LINE_TPL.format(i=0, x0=50, x1=400, y=100, yt=60, yb=110)]
    p = tmp_path / "page.xml"
    p.write_text(PAGE_XML.format(lines="\n".join(lines)))
    # no clustering first: line has no article id -> singleton region
    region_dict = generate_text_regions_for_page(str(p))
    assert len(region_dict) == 1
    page = Page(str(p))
    assert len(page.get_text_regions()) == 1
