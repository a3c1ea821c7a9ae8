"""Pipeline robustness on degenerate inputs: empty pages, single lines,
missing baselines, tiny images. The reference's behavior is skip-and-log
(skipped_files / skipped_pages contracts); stages must not crash."""
import os

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.pagexml import Page


def _write_page(tmp_path, name, lines_xml, w=200, h=160):
    img = np.full((h, w), 255, np.uint8)
    Image.fromarray(img).save(tmp_path / f"{name}.png")
    xml = f'''<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="{name}.png" imageWidth="{w}" imageHeight="{h}">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="10,10 190,10 190,150 10,150"/>
{lines_xml}
    </TextRegion>
  </Page>
</PcGts>'''
    (tmp_path / "page").mkdir(exist_ok=True)
    (tmp_path / "page" / f"{name}.xml").write_text(xml)
    return str(tmp_path / f"{name}.png"), str(tmp_path / "page" / f"{name}.xml")


def test_baseline_clustering_empty_page(tmp_path):
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    _, page_path = _write_page(tmp_path, "empty", "")
    cluster_page(page_path)  # no text lines: must be a no-op, not a crash
    assert Page(page_path).get_textlines() == []


def test_baseline_clustering_single_line(tmp_path):
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    line = '''<TextLine id="tl_0">
      <Coords points="20,40 180,40 180,60 20,60"/>
      <Baseline points="20,55 180,55"/>
    </TextLine>'''
    _, page_path = _write_page(tmp_path, "single", line)
    cluster_page(page_path)
    tls = Page(page_path).get_textlines()
    assert len(tls) == 1 and tls[0].get_article_id()


def test_line_without_baseline_is_tolerated(tmp_path):
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    lines = '''<TextLine id="tl_0">
      <Coords points="20,40 180,40 180,60 20,60"/>
      <Baseline points="20,55 180,55"/>
    </TextLine>
    <TextLine id="tl_1">
      <Coords points="20,80 180,80 180,100 20,100"/>
    </TextLine>'''
    _, page_path = _write_page(tmp_path, "nobl", lines)
    cluster_page(page_path)
    page = Page(page_path)
    with_bl = [tl for tl in page.get_textlines() if tl.baseline]
    assert all(tl.get_article_id() for tl in with_bl)


def test_textregion_generation_empty_page(tmp_path):
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page
    _, page_path = _write_page(tmp_path, "emptyr", "")
    generate_text_regions_for_page(page_path)  # no articles: no-op


def test_separator_stage_blank_image(tmp_path):
    """Blank page through the separator stage with a nothing-detector."""
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    img_path, _ = _write_page(tmp_path, "blank", "")

    def predict(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        prob[..., 1] = 1.0
        return prob

    SeparatorNetPostProcessor([img_path], predict, fixed_height=None).run()
    out = Page(str(tmp_path / "page" / "blank.xml.xml"))
    assert out.get_regions().get("SeparatorRegion", []) == []


def test_feature_generation_one_region_skipped(tmp_path):
    """<2 text regions -> page skipped (reference skipped_pages), no file."""
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    line = '''<TextLine id="tl_0">
      <Coords points="20,40 180,40 180,60 20,60"/>
      <Baseline points="20,55 180,55"/>
    </TextLine>'''
    _, page_path = _write_page(tmp_path, "onereg", line)
    cluster_page(page_path)
    generate_text_regions_for_page(page_path)
    out = generate_feature_jsons([page_path],
                                 out_path=str(tmp_path / "json"))
    assert out == []


def test_tiny_image_through_predictor():
    from citlab_as_tpu.inference import SegmentationPredictor
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32)
    probs = pred(np.zeros((5, 7), np.float32))
    assert probs.shape == (5, 7, 2)


def test_relation_predictor_two_nodes():
    from citlab_as_tpu.inference import RelationPredictor
    pred = RelationPredictor(model_dir=None, node_buckets=[8])
    graph = {"num_nodes": 2, "interacting_nodes": [[0, 1]],
             "num_interacting_nodes": 1,
             "node_features": np.zeros((2, 15)).tolist(),
             "edge_features": [[0.0, 1.0]]}
    conf = pred(graph)
    assert conf.shape == (2, 2)


def test_clustering_degenerate_confidences():
    from citlab_as_tpu.stages.clustering import TextblockClustering
    # all-same confidences must still produce a valid partition
    tb = TextblockClustering()
    tb.set_confs([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    tb.calc(method="dbscan")
    assert len(tb.tb_labels) == 3
    tb.calc(method="greedy")
    assert len(tb.tb_labels) == 3


def test_page_with_invalid_coords_preprocessing(tmp_path):
    from citlab_as_tpu.stages.preprocessing import remove_incorrect_regions_and_lines
    lines = '''<TextLine id="tl_bad">
      <Coords points=""/>
    </TextLine>
    <TextLine id="tl_ok">
      <Coords points="20,40 180,40 180,60 20,60"/>
      <Baseline points="20,55 180,55"/>
    </TextLine>'''
    _, page_path = _write_page(tmp_path, "badcoords", lines)
    remove_incorrect_regions_and_lines([page_path])
    ids = [tl.id for tl in Page(page_path).get_textlines()]
    assert "tl_ok" in ids and "tl_bad" not in ids
