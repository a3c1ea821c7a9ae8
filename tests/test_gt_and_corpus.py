"""Tests: article rectangles, GT generators, corpus tools."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.pagexml import Page
from citlab_as_tpu.stages.article_rectangles import (
    ArticleRectangle, get_article_rectangles_from_baselines,
    get_article_rectangles_from_surr_polygons,
    get_article_surrounding_polygons, merge_article_rectangles_vertically,
    smooth_article_surrounding_polygons,
)
from citlab_as_tpu.stages.ground_truth import (
    GroundTruthGenerator, RegionGroundTruthGenerator,
    create_other_ground_truth_image, create_text_file_from_page,
    generate_as_ground_truth, make_disjoint, min_area_rect, plot_polys_binary,
)
from citlab_as_tpu.utils.corpus_tools import (
    create_sub_lists, generate_bert_finetuning_data, get_page_stats,
    overwrite_article_ids,
)


PAGE_TPL = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="{img}" imageWidth="{w}" imageHeight="{h}">
    <PrintSpace><Coords points="0,0 {w},0 {w},{h} 0,{h}"/></PrintSpace>
{body}
  </Page>
</PcGts>
"""

LINE_TPL = """<TextLine id="tl_{i}" custom="structure {{id:{aid}; type:article;}}">
  <Coords points="{x0},{yt} {x1},{yt} {x1},{yb} {x0},{yb}"/>
  <Baseline points="{x0},{y} {x1},{y}"/>
  <TextEquiv><Unicode>{text}</Unicode></TextEquiv>
</TextLine>"""


def _write_page(tmp_path, name="p1", w=600, h=600, with_img=True):
    lines = []
    i = 0
    # article a1: top block; article a2: bottom block
    for aid, ys in (("a1", (80, 140, 200)), ("a2", (380, 440, 500))):
        for y in ys:
            lines.append(LINE_TPL.format(i=i, aid=aid, x0=50, x1=550, y=y,
                                         yt=y - 35, yb=y + 5, text=f"line {i}"))
            i += 1
    body = ('<TextRegion id="tr_1" type="paragraph">'
            f'<Coords points="40,40 560,40 560,560 40,560"/>'
            + "\n".join(lines) + "</TextRegion>")
    (tmp_path / "page").mkdir(exist_ok=True)
    page_path = tmp_path / "page" / f"{name}.xml"
    page_path.write_text(PAGE_TPL.format(img=f"{name}.png", w=w, h=h, body=body))
    if with_img:
        img = np.full((h, w), 255, np.uint8)
        for y in (80, 140, 200, 380, 440, 500):
            img[y - 20:y, 60:540] = 0
        Image.fromarray(img).save(tmp_path / f"{name}.png")
    return str(page_path)


# ---------------------------------------------------------------- rectangles
def test_article_rectangles_from_baselines(tmp_path):
    page_path = _write_page(tmp_path)
    ar_dict = get_article_rectangles_from_baselines(page_path)
    assert set(ar_dict.keys()) == {"a1", "a2"}
    for aid, ars in ar_dict.items():
        assert ars
        all_tls = [tl for ar in ars for tl in ar.textlines]
        assert len(all_tls) == 3
    # rectangles of different articles don't overlap
    for ar1 in ar_dict["a1"]:
        for ar2 in ar_dict["a2"]:
            inter = ar1.intersection(ar2)
            assert not (inter.width > 0 and inter.height > 0)


def test_merge_and_surrounding_polygons(tmp_path):
    page_path = _write_page(tmp_path)
    ar_dict = get_article_rectangles_from_baselines(page_path)
    surr = merge_article_rectangles_vertically(ar_dict)
    assert set(surr.keys()) == {"a1", "a2"}
    assert all(len(polys) >= 1 for polys in surr.values())
    asp = get_article_surrounding_polygons(
        {aid: list(ars) for aid, ars in ar_dict.items()})
    sm = smooth_article_surrounding_polygons(asp)
    assert set(sm.keys()) == {"a1", "a2"}


def test_quadtree_subdivision(tmp_path):
    page_path = _write_page(tmp_path)
    ars, img_h, img_w = get_article_rectangles_from_surr_polygons(
        page_path, use_max_rect_size=False)
    assert (img_w, img_h) == (600, 600)
    # every leaf is article-pure
    assert all(len(ar.a_ids) <= 1 for ar in ars)
    covered = {tl.id for ar in ars for tl in (ar.textlines or [])}
    assert len(covered) == 6


def test_contains_polygon():
    from citlab_as_tpu.geometry.polygon import Polygon
    ar = ArticleRectangle(0, 0, 100, 100)
    inside = Polygon([10, 90], [50, 50])
    outside = Polygon([200, 300], [50, 50])
    crossing = Polygon([-50, 50], [50, 50])
    assert ar.contains_polygon(inside, 0, 0, 100, 100)
    assert not ar.contains_polygon(outside, 0, 0, 100, 100)
    assert ar.contains_polygon(crossing, 0, 0, 100, 100)


# ---------------------------------------------------------------- GT images
def test_plot_polys_binary_and_other_channel():
    img = plot_polys_binary([[(10, 10), (50, 10), (50, 30), (10, 30)]],
                            64, 64, fill_polygons=True)
    assert img[20, 30] == 255 and img[50, 50] == 0
    other = create_other_ground_truth_image(img)
    assert other[20, 30] == 0 and other[50, 50] == 255
    a = np.zeros((4, 4), np.uint8)
    a[0, 0] = 255
    b = np.full((4, 4), 255, np.uint8)
    assert make_disjoint(a, b)[0, 0] == 0


def test_min_area_rect_rotated():
    pts = [(0, 0), (10, 10), (8, 12), (-2, 2)]  # rotated rectangle corners
    rect = min_area_rect(pts)
    assert len(rect) == 4
    # area close to 2*sqrt(2) * ~14.1 / exact: width ~2.83, len ~14.1
    def area(quad):
        x = [p[0] for p in quad]
        y = [p[1] for p in quad]
        return abs(sum(x[i] * y[(i + 1) % 4] - x[(i + 1) % 4] * y[i]
                       for i in range(4))) / 2
    assert area(rect) == pytest.approx(40, rel=0.05)


def test_region_gt_generator(tmp_path):
    page_path = _write_page(tmp_path)
    img_path = str(tmp_path / "p1.png")
    gen = RegionGroundTruthGenerator([img_path],
                                     region_types=["TextRegion", "SeparatorRegion"])
    written = gen.run_ground_truth_generation(str(tmp_path / "gt"))
    assert any("C3" in w for w in written)
    # TextRegion + SeparatorRegion + other = 3 channels
    assert len(gen.gt_imgs_lst[0]) == 3
    tr_channel = gen.gt_imgs_lst[0][0]
    assert tr_channel[300, 300] == 255  # inside the region
    other = gen.gt_imgs_lst[0][2]
    assert other[300, 300] == 0
    info = (tmp_path / "gt" / "info.txt").read_text()
    assert "GT0: TextRegion" in info
    json_path = gen.create_ground_truth_json(str(tmp_path / "gt_json"))
    data = json.loads(open(json_path).read())
    assert "p1.png" in data


def test_as_gt_generation(tmp_path):
    page_path = _write_page(tmp_path)
    channels = generate_as_ground_truth(
        page_path, save_folder=str(tmp_path / "as_gt"))
    assert set(channels) == {"article", "baseline", "other"}
    assert channels["article"].any()
    assert channels["baseline"].any()
    files = os.listdir(tmp_path / "as_gt")
    assert len(files) == 3


def test_article_text_export(tmp_path):
    page_path = _write_page(tmp_path)
    texts = create_text_file_from_page(page_path, str(tmp_path / "texts"))
    assert set(texts) == {"a1", "a2"}
    assert "line 0" in texts["a1"]
    assert (tmp_path / "texts" / "a1.txt").exists()


# ---------------------------------------------------------------- corpus
def test_overwrite_article_ids(tmp_path):
    page_path = _write_page(tmp_path, name="hyp")
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    gt_path = _write_page(gt_dir, name="hyp")
    # modify GT article ids
    gt_page = Page(gt_path)
    tls = gt_page.get_textlines()
    for tl in tls:
        tl.set_article_id("a9")
    gt_page.set_textline_attr(tls)
    gt_page.write_page_xml(gt_path)

    files, lines = overwrite_article_ids([page_path], [gt_path])
    assert files == 1 and lines == 6
    page = Page(page_path)
    assert all(tl.get_article_id() == "a9" for tl in page.get_textlines())


def test_page_stats(tmp_path):
    page_path = _write_page(tmp_path)
    stats = get_page_stats(page_path)
    assert stats["num_text_lines"] == 6
    assert stats["num_articles"] == 2
    assert stats["regions"]["TextRegion"] == 1


def test_create_sub_lists(tmp_path):
    lst = tmp_path / "all.lst"
    lst.write_text("".join(f"file_{i}.xml\n" for i in range(20)))
    train, val, test = create_sub_lists(str(lst), split=0.2, seed=0)
    assert len(open(train).readlines()) == 12
    assert len(open(val).readlines()) == 4
    assert len(open(test).readlines()) == 4


def test_bert_pair_export(tmp_path):
    # page with two regions of different articles
    body = ""
    for r, (aid, y0) in enumerate((("a1", 50), ("a2", 300))):
        body += f'''<TextRegion id="tr_{r}" type="paragraph">
  <Coords points="50,{y0} 550,{y0} 550,{y0 + 100} 50,{y0 + 100}"/>
  <TextLine id="r{r}_tl" custom="structure {{id:{aid}; type:article;}}">
    <Coords points="50,{y0} 550,{y0} 550,{y0 + 40} 50,{y0 + 40}"/>
    <Baseline points="50,{y0 + 30} 550,{y0 + 30}"/>
    <TextEquiv><Unicode>region {r} text</Unicode></TextEquiv>
  </TextLine>
</TextRegion>'''
    (tmp_path / "page").mkdir()
    p = tmp_path / "page" / "b.xml"
    p.write_text(PAGE_TPL.format(img="b.png", w=600, h=600, body=body))
    out = generate_bert_finetuning_data([str(p)], str(tmp_path / "bert.json"))
    records = json.loads(open(out).read())
    assert len(records) == 1
    assert records[0]["label"] == 0  # different articles


def _write_region_page(tmp_path, name="r1", w=600, h=600):
    """Page with paragraphs, typed/subtyped headings, a caption, and an
    ImageRegion that overlaps one paragraph (for get_valid_text_regions)."""
    body = """
<TextRegion id="p_ok" type="paragraph">
  <Coords points="40,300 200,300 200,400 40,400"/></TextRegion>
<TextRegion id="p_overlap" type="paragraph">
  <Coords points="250,300 500,300 500,400 250,400"/></TextRegion>
<TextRegion id="p_inside" type="paragraph">
  <Coords points="320,320 380,320 380,360 320,360"/></TextRegion>
<TextRegion id="h_title" type="heading" custom="structure {type:title; subtype:headline;}">
  <Coords points="40,40 560,40 560,90 40,90"/></TextRegion>
<TextRegion id="h_classic" type="heading" custom="structure {type:heading; subtype:overline;}">
  <Coords points="40,100 560,100 560,140 40,140"/></TextRegion>
<TextRegion id="h_bare" type="heading" custom="structure {type:heading;}">
  <Coords points="40,150 560,150 560,190 40,190"/></TextRegion>
<TextRegion id="cap" type="caption">
  <Coords points="40,480 300,480 300,520 40,520"/></TextRegion>
<GraphicRegion id="img_1">
  <Coords points="290,290 560,290 560,460 290,460"/></GraphicRegion>
"""
    (tmp_path / "page").mkdir(exist_ok=True)
    page_path = tmp_path / "page" / f"{name}.xml"
    page_path.write_text(PAGE_TPL.format(img=f"{name}.png", w=w, h=h, body=body))
    Image.fromarray(np.full((h, w), 255, np.uint8)).save(tmp_path / f"{name}.png")
    return str(tmp_path / f"{name}.png")


def test_get_valid_text_regions_intersection_filter(tmp_path):
    img_path = _write_region_page(tmp_path)
    gen = RegionGroundTruthGenerator([img_path])
    # p_inside is contained in the image bbox, p_overlap intersects it by
    # 200x100 (> 20 px in both dims) -> both dropped; p_ok survives
    valid = gen.get_valid_text_regions(intersection_thresh=20)
    assert [r.id for r in valid[0]] == ["p_ok"]
    # negative threshold disables the image check entirely
    all_paras = gen.get_valid_text_regions(intersection_thresh=-1)
    assert [r.id for r in all_paras[0]] == ["p_ok", "p_overlap", "p_inside"]
    # a wide-open threshold only drops the fully contained region
    loose = gen.get_valid_text_regions(intersection_thresh=150)
    assert [r.id for r in loose[0]] == ["p_ok", "p_overlap"]


def test_title_classic_heading_caption_getters(tmp_path):
    img_path = _write_region_page(tmp_path)
    gen = RegionGroundTruthGenerator([img_path])
    titles = gen.get_title_regions_list(["headline"])
    assert [r.id for r in titles[0]] == ["h_title"]
    classic = gen.get_classic_heading_regions_list(["overline"])
    assert [r.id for r in classic[0]] == ["h_classic"]
    # subtype '' selects heading-typed regions WITHOUT a subtype entry
    bare = gen.get_classic_heading_regions_list([""])
    assert [r.id for r in bare[0]] == ["h_bare"]
    captions = gen.get_caption_text_regions()
    assert [r.id for r in captions[0]] == ["cap"]
    images = gen.get_image_regions_list()
    assert [r.id for r in images[0]] == ["img_1"]


def test_region_gt_use_bounding_box_golden(tmp_path):
    # L-shaped region: the filled-polygon mask must differ from its bbox mask
    body = ('<TextRegion id="L" type="paragraph">'
            '<Coords points="40,40 300,40 300,150 150,150 150,300 40,300"/>'
            "</TextRegion>")
    (tmp_path / "page").mkdir(exist_ok=True)
    (tmp_path / "page" / "L.xml").write_text(
        PAGE_TPL.format(img="L.png", w=400, h=400, body=body))
    Image.fromarray(np.full((400, 400), 255, np.uint8)).save(tmp_path / "L.png")
    img_path = str(tmp_path / "L.png")

    gen = RegionGroundTruthGenerator([img_path], region_types=["TextRegion"])
    gen.create_ground_truth_images()
    poly_mask = gen.gt_imgs_lst[0][0]
    assert poly_mask[100, 100] == 255 and poly_mask[250, 250] == 0

    gen_bb = RegionGroundTruthGenerator([img_path], use_bounding_box=True,
                                        region_types=["TextRegion"])
    gen_bb.create_ground_truth_images()
    bb_mask = gen_bb.gt_imgs_lst[0][0]
    # bbox fills the L's notch
    assert bb_mask[100, 100] == 255 and bb_mask[250, 250] == 255
    assert bb_mask[250, 100] == 255 and bb_mask[350, 350] == 0
