"""Tests for plotting, colors, image utils, misc helpers, preprocessing."""
import os

import numpy as np
import pytest

from citlab_as_tpu.geometry.rectangle import Rectangle
from citlab_as_tpu.ops.image_utils import (
    apply_transform, get_binarization, get_rotation_angle, is_whitespace,
    resize_image_ratio, shape_to_mask,
)
from citlab_as_tpu.utils.colors import COLORS, get_article_color
from citlab_as_tpu.utils.misc import chunk_list, group_by_attribute, split_list


def test_colors_palette():
    assert COLORS[0] == "darkgreen"
    assert len(COLORS) > 52  # extended with css4
    assert get_article_color(0) == "darkgreen"
    assert get_article_color(len(COLORS)) == "darkgreen"  # wraps


def test_split_and_chunk():
    assert split_list(list(range(10)), 3) == [[0, 1, 2, 3], [4, 5, 6], [7, 8, 9]]
    assert chunk_list(list(range(5)), 2) == [[0, 1], [2, 3], [4]]


def test_group_by_attribute():
    class O:
        def __init__(self, k):
            self.k = k
    objs = [O("a"), O("b"), O("a")]
    groups = group_by_attribute(objs, "k")
    assert len(groups["a"]) == 2 and len(groups["b"]) == 1


def test_binarization_and_whitespace():
    img = np.full((50, 50), 255, np.uint8)
    img[10:40, 10:40] = 0  # black box
    binary = get_binarization(img)
    assert binary[20, 20] == 1 and binary[5, 5] == 0
    assert is_whitespace(binary, Rectangle(0, 0, 8, 8))
    assert not is_whitespace(binary, Rectangle(10, 10, 20, 20))


def test_apply_transform():
    img = np.zeros((20, 20), np.uint8)
    img[8:12, 8:12] = 255
    dilated = apply_transform(img, "dilation", kernel_size=(3, 3))
    assert dilated[7, 7] == 255
    eroded = apply_transform(img, "erosion", kernel_size=(3, 3))
    assert eroded.sum() < img.sum()
    dilated_e = apply_transform(img, "dilation", kernel_type="ellipse")
    assert dilated_e.sum() > img.sum()   # cv2 parity in tests/test_ops.py
    with pytest.raises(ValueError):
        apply_transform(img, "dilation", kernel_type="diamond")
    with pytest.raises(ValueError):
        apply_transform(img, "nope")


def test_shape_to_mask():
    m = shape_to_mask((10, 10), [(2, 2), (7, 7)], shape_type="rectangle")
    assert m[3, 3] and not m[9, 9]
    m2 = shape_to_mask((10, 10), [(0, 0), (9, 0), (5, 9)])
    assert m2.dtype == bool and m2.any()


def test_rotation_angle_detects_skew():
    img = np.zeros((100, 100), np.float32)
    for y in range(20, 80, 10):
        img[y:y + 2, 10:90] = 1.0
    _, angle0 = get_rotation_angle(img, delta=0.5, limit=2)
    assert abs(angle0) < 0.6  # straight lines -> ~0 skew


def test_resize_image_ratio():
    img = np.zeros((300, 600), np.float32)
    out, (nh, nw) = resize_image_ratio(img, min_dimension=100, max_dimension=150)
    # min side would go to 100 => large side 200 > 150 -> cap to 150
    assert (nh, nw) == (75, 150)
    assert out.shape[:2] == (75, 150)
    out2, _ = resize_image_ratio(img, 100, 1000, pad_to_max_dimension=True)
    assert out2.shape == (1000, 1000)


def test_plot_pagexml_renders(tmp_path):
    from PIL import Image
    from citlab_as_tpu.pagexml.plot import plot_pagexml, article_color_map
    img = np.full((100, 120), 255, np.uint8)
    Image.fromarray(img).save(tmp_path / "p.png")
    xml = """<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>c</Creator><Created>t</Created><LastChange>t</LastChange></Metadata>
  <Page imageFilename="p.png" imageWidth="120" imageHeight="100">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="5,5 115,5 115,95 5,95"/>
      <TextLine id="tl_1" custom="structure {id:a1; type:article;}">
        <Coords points="5,5 115,5 115,30 5,30"/>
        <Baseline points="5,25 115,25"/>
        <TextEquiv><Unicode>x</Unicode></TextEquiv>
      </TextLine>
    </TextRegion>
  </Page>
</PcGts>"""
    page_path = tmp_path / "page.xml"
    page_path.write_text(xml)
    out = tmp_path / "plot.png"
    plot_pagexml(str(page_path), str(tmp_path / "p.png"), save_path=str(out))
    assert out.exists() and out.stat().st_size > 1000
    cm = article_color_map(["a2", "a1", None])
    assert cm[None] == "k" and cm["a1"] != cm["a2"]


def test_preprocessing_duplicate_ids(tmp_path):
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.preprocessing import PagePreProcessor
    xml = """<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>c</Creator><Created>t</Created><LastChange>t</LastChange></Metadata>
  <Page imageFilename="p.png" imageWidth="100" imageHeight="100">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="0,0 100,0 100,100 0,100"/>
      <TextLine id="dup"><Coords points="0,0 50,0 50,10 0,10"/>
        <Baseline points="0,8 50,8"/><TextEquiv><Unicode>a</Unicode></TextEquiv></TextLine>
      <TextLine id="dup"><Coords points="0,20 50,20 50,30 0,30"/>
        <Baseline points="0,28 50,28"/><TextEquiv><Unicode>b</Unicode></TextEquiv></TextLine>
    </TextRegion>
  </Page>
</PcGts>"""
    p = tmp_path / "page.xml"
    p.write_text(xml)
    proc = PagePreProcessor([str(p)])
    proc.delete_textlines_with_same_id()
    proc.save_page_files(overwrite=True)
    page = Page(str(p))
    assert len(page.get_textlines(ignore_redundant_textlines=False)) == 1
