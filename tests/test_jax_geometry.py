"""Device geometry kernel tests: angles + interline distances vs host."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from citlab_as_tpu.geometry.jax_kernels import (
    interline_distances_device, pack_polys, regression_angles,
)
from citlab_as_tpu.geometry.pairwise import min_perpendicular_distances
from citlab_as_tpu.geometry.polygon import Polygon, calc_reg_line_stats, norm_poly_dists
from citlab_as_tpu.stages.textblock_postprocess import (
    TextBlockNetPostProcessor, get_separators, remove_every_nth_point, xy_cut,
)
from citlab_as_tpu.eval.heading_eval import (
    evaluate_heading_pages, get_heading_regions,
)


def _make_baselines(rng, n_lines=8, page_w=1000, line_h=60):
    polys = []
    for i in range(n_lines):
        y = 50 + i * line_h + rng.randint(-8, 9)
        x0 = rng.randint(0, 100)
        x1 = page_w - rng.randint(0, 300)
        polys.append(Polygon([x0, (x0 + x1) // 2, x1],
                             [y, y + rng.randint(-3, 4), y]))
    return polys


def _assert_angles_close(device, host, atol=1e-4):
    """Angles are directions: compare circularly (0 == 2*pi)."""
    diff = np.abs(np.asarray(device) - np.asarray(host))
    diff = np.minimum(diff, 2 * np.pi - diff)
    assert np.all(diff < atol), (device, host)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_regression_angles_match_host(seed):
    rng = np.random.RandomState(seed)
    polys = norm_poly_dists(_make_baselines(rng), des_dist=5)
    points, mask = pack_polys(polys)
    device = np.asarray(regression_angles(jnp.asarray(points), jnp.asarray(mask)))
    host = np.array([calc_reg_line_stats(p)[0] for p in polys])
    _assert_angles_close(device, host)


def test_regression_angles_special_cases():
    polys = [
        Polygon([5, 5], [0, 10]),           # vertical two-point
        Polygon([10, 0], [5, 5]),           # right-to-left
        Polygon([0, 10], [10, 0]),          # 45 deg
    ]
    points, mask = pack_polys(polys)
    device = np.asarray(regression_angles(jnp.asarray(points), jnp.asarray(mask)))
    host = np.array([calc_reg_line_stats(p)[0] for p in polys])
    _assert_angles_close(device, host)


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_device_interline_vs_host(seed):
    rng = np.random.RandomState(seed)
    polys = norm_poly_dists(_make_baselines(rng), des_dist=5)
    device = interline_distances_device(polys, des_dist=5, max_d=500)
    host = min_perpendicular_distances(polys, tick_dist=5, max_d=500)
    device = np.asarray(device)
    host = np.asarray(host)
    # the device kernel computes the true minimum; the host running-skip can
    # only overestimate
    assert np.all(device <= host + 1e-3)
    # in the typical (non-degenerate) case they agree
    agree = np.isclose(device, host, atol=1e-3).mean()
    assert agree >= 0.8


# ---------------------------------------------------------------- textblock pp
def test_remove_every_nth_point():
    poly = [(i, i) for i in range(100)]
    out = remove_every_nth_point(list(poly), n=2, min_num_points=20, iterations=1)
    assert len(out) == 50
    short = [(i, i) for i in range(10)]
    assert remove_every_nth_point(list(short)) == short


def test_textblock_postprocessor():
    prob = np.zeros((60, 60, 2), np.float32)
    prob[10:50, 10:50, 0] = 0.9
    prob[2:3, 2:3, 0] = 0.9  # tiny CC, removed (< 100 px)
    proc = TextBlockNetPostProcessor(threshold=0.05)
    polys = proc.run_on_probability_map(prob)
    assert len(polys) == 1
    xs = [p[0] for p in polys[0]]
    assert min(xs) == 10 and max(xs) == 50


def test_xy_cut_two_columns():
    img = np.zeros((100, 100), np.uint8)
    img[10:90, 10:45] = 255
    img[10:90, 55:90] = 255
    leaves = xy_cut(img, max_recursion_depth=4, mode="vertical", threshold=0.9)
    assert len(leaves) >= 2
    centers = sorted((r.x + r.width / 2) for r in leaves)
    assert centers[0] < 50 < centers[-1]


def test_get_separators_profile():
    img = np.zeros((10, 10), np.uint8)
    img[4:6, :] = 255  # white band rows 4-5
    seps = get_separators(img, mode="horizontal", threshold=0.5)
    assert [i for i, _ in seps] == [4, 5]


# ---------------------------------------------------------------- heading eval
def test_evaluate_heading_pages(tmp_path):
    def page_xml(types):
        regions = "".join(
            f'''<TextRegion id="tr_{i}" type="{t}">
  <Coords points="0,{i * 100} 100,{i * 100} 100,{i * 100 + 90} 0,{i * 100 + 90}"/>
  <TextLine id="tl_{i}"><Coords points="0,{i * 100} 100,{i * 100} 100,{i * 100 + 40} 0,{i * 100 + 40}"/>
    <Baseline points="0,{i * 100 + 30} 100,{i * 100 + 30}"/>
    <TextEquiv><Unicode>x</Unicode></TextEquiv></TextLine>
</TextRegion>''' for i, t in enumerate(types))
        return f'''<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>c</Creator><Created>t</Created><LastChange>t</LastChange></Metadata>
  <Page imageFilename="x.png" imageWidth="100" imageHeight="{len(types) * 100}">
{regions}
  </Page>
</PcGts>'''

    gt = tmp_path / "gt.xml"
    gt.write_text(page_xml(["heading", "paragraph", "paragraph"]))
    hyp = tmp_path / "hyp.xml"
    hyp.write_text(page_xml(["heading", "heading", "paragraph"]))

    from citlab_as_tpu.pagexml import Page
    assert len(get_heading_regions(Page(str(gt)))) == 1
    metrics = evaluate_heading_pages([str(gt)], [str(hyp)])
    assert metrics["recall_binary"] == 1.0
    assert metrics["precision_binary"] == 0.5
