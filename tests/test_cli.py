"""CLI + full-workflow smoke tests on synthetic pages."""
import json
import os
import re

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.pagexml import Page


def _page_with_lines(tmp_path, name="p1", w=400, h=320):
    """Two text columns -> two articles after clustering (>= 2 GNN nodes)."""
    img = np.full((h, w), 255, np.uint8)
    # text strokes for the SWT / nets
    for y0 in (60, 120, 180, 240):
        for x0 in list(range(30, 170, 25)) + list(range(230, 370, 25)):
            img[y0:y0 + 12, x0:x0 + 5] = 0
    Image.fromarray(img).save(tmp_path / f"{name}.png")
    lines = []
    i = 0
    for x0, x1 in ((30, 170), (230, 370)):
        for y in (72, 132, 192, 252):
            lines.append(f'''<TextLine id="tl_{i}">
      <Coords points="{x0},{y - 15} {x1},{y - 15} {x1},{y + 3} {x0},{y + 3}"/>
      <Baseline points="{x0},{y} {x1},{y}"/>
      <TextEquiv><Unicode>line number {i}</Unicode></TextEquiv>
    </TextLine>''')
            i += 1
    xml = f'''<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="{name}.png" imageWidth="{w}" imageHeight="{h}">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="20,40 380,40 380,270 20,270"/>
{chr(10).join(lines)}
    </TextRegion>
  </Page>
</PcGts>'''
    (tmp_path / "page").mkdir(exist_ok=True)
    (tmp_path / "page" / f"{name}.xml").write_text(xml)
    return str(tmp_path / f"{name}.png")


def test_baseline_clustering_cli(tmp_path):
    from citlab_as_tpu.cli.run_baseline_clustering import main
    _page_with_lines(tmp_path)
    page_path = str(tmp_path / "page" / "p1.xml")
    main(["--path_to_xml_file", page_path])
    page = Page(page_path)
    assert all(tl.get_article_id() for tl in page.get_textlines())


def test_textregion_cli(tmp_path):
    from citlab_as_tpu.cli.run_baseline_clustering import main as cluster_main
    from citlab_as_tpu.cli.run_textregion_generation import main as region_main
    _page_with_lines(tmp_path)
    page_path = str(tmp_path / "page" / "p1.xml")
    cluster_main(["--path_to_xml_file", page_path])
    region_main(["--path_to_xml_file", page_path])
    page = Page(page_path)
    assert len(page.get_text_regions()) >= 1


def test_feature_generation_cli(tmp_path):
    from citlab_as_tpu.cli.run_baseline_clustering import main as cluster_main
    from citlab_as_tpu.cli.run_feature_generation import main as feat_main
    from citlab_as_tpu.cli.run_textregion_generation import main as region_main
    _page_with_lines(tmp_path)
    page_path = str(tmp_path / "page" / "p1.xml")
    cluster_main(["--path_to_xml_file", page_path])
    region_main(["--path_to_xml_file", page_path])
    lst = tmp_path / "pages.lst"
    lst.write_text(page_path + "\n")
    out_dir = str(tmp_path / "json_out")
    feat_main(["--pagexml_list", str(lst), "--out_path", out_dir])
    jsons = os.listdir(out_dir)
    assert len(jsons) == 1
    with open(os.path.join(out_dir, jsons[0])) as f:
        graph = json.load(f)
    assert graph["num_nodes"] >= 2


def test_measure_cli(tmp_path):
    from citlab_as_tpu.cli.run_measure import main
    from citlab_as_tpu.cli.run_baseline_clustering import main as cluster_main
    _page_with_lines(tmp_path)
    page_path = str(tmp_path / "page" / "p1.xml")
    cluster_main(["--path_to_xml_file", page_path])
    gt_lst = tmp_path / "gt.lst"
    gt_lst.write_text(page_path + "\n")
    out = main(["--path_to_gt_xml_lst", str(gt_lst),
                "--path_to_hy_xml_lst", str(gt_lst),
                "--min_tol", "10", "--max_tol", "30"])
    assert out["as"][2] == pytest.approx(1.0)


def test_page_preprocessing_cli(tmp_path):
    from citlab_as_tpu.cli.run_page_preprocessing import main
    _page_with_lines(tmp_path)
    page_path = str(tmp_path / "page" / "p1.xml")
    lst = tmp_path / "pages.lst"
    lst.write_text(page_path + "\n")
    main(["--page_path_list", str(lst), "--overwrite"])
    assert Page(page_path).get_textlines()


def test_full_workflow_smoke(tmp_path):
    """All five stages end-to-end on one tiny page. Synthetic segmentation
    predictors (a clean vertical separator between the two columns; a benign
    heading map) stand in for trained nets; the GNN runs randomly
    initialized."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow

    def separator_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        x = w // 2
        prob[10:h - 10, x - 2:x + 2, 0] = 0.9  # vertical separator mid-page
        prob[..., 1] = 1.0 - prob[..., 0]
        return prob

    def heading_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        prob[..., 1] = 1.0
        return prob

    img_path = _page_with_lines(tmp_path)
    result = run_full_workflow(
        [img_path], clustering_method="dbscan", out_dir=str(tmp_path / "out"),
        separator_predictor=separator_predictor,
        heading_predictor=heading_predictor)
    assert len(result["pages"]) == 1
    out_page = result["pages"][0]
    assert os.path.exists(out_page)
    page = Page(out_page)
    # pipeline produced text regions with article ids
    assert page.get_text_regions()
    assert all(tl.get_article_id() for tl in page.get_textlines())
    # GNN clustering output written
    assert result["clustered"] and os.path.exists(result["clustered"][0])
    assert set(result["timings"]) >= {
        "separator", "heading", "baseline_clustering", "textregion",
        "features", "gnn_clustering"}


@pytest.mark.slow
def test_full_workflow_pipelined_cpu_fallback(tmp_path):
    """On the CPU test backend the pipelined driver falls back to the
    sequential path and produces the same outputs/contract."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow_pipelined
    from citlab_as_tpu.pagexml import Page

    img_path = _page_with_lines(tmp_path)

    def separator_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        x = w // 2
        prob[10:h - 10, x - 2:x + 2, 0] = 0.9
        prob[..., 1] = 1.0 - prob[..., 0]
        return prob

    def heading_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        prob[..., 1] = 1.0
        return prob

    result = run_full_workflow_pipelined(
        [img_path], out_dir=str(tmp_path / "out"),
        separator_predictor=separator_predictor,
        heading_predictor=heading_predictor)
    assert result["clustered"] and os.path.exists(result["clustered"][0])
    page = Page(result["clustered"][0])
    assert page.get_textlines()


@pytest.mark.slow
def test_full_workflow_pipelined_forced_matches_sequential(tmp_path):
    """The 3-stage wave loop itself (force=True on the CPU backend, fused
    programs and all), byte-compared against the sequential driver: same
    page XMLs, same clustering XMLs. Exercises multi-wave pipelining (three
    same-shape groups at batch_size=2) and the pipeline flush."""
    import shutil
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import (
        run_full_workflow, run_full_workflow_pipelined)
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def ckpt(name):
        d = os.path.join(repo, "models_ckpt", name)
        return d if os.path.isdir(d) else None

    corpora = {}
    for variant in ("seq", "pipe"):
        work = tmp_path / variant
        work.mkdir()
        rng = np.random.RandomState(7)
        corpora[variant] = [
            make_demo_page(str(work), f"p{i}", rng, w=500, h=700)[0]
            for i in range(5)]

    sep = SegmentationPredictor(ckpt("separator"))
    head = SegmentationPredictor(ckpt("heading"))
    gnn = RelationPredictor(ckpt(os.path.join("gnn", "best", "f1")))

    kw = dict(separator_fixed_height=512, heading_fixed_height=384,
              batch_size=2)
    run_full_workflow(
        corpora["seq"], out_dir=str(tmp_path / "seq_out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        **kw)
    res = run_full_workflow_pipelined(
        corpora["pipe"], out_dir=str(tmp_path / "pipe_out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        force=True, **kw)
    assert len(res["clustered"]) == 5

    import re

    def normalized(path):
        # the writers stamp LastChange with the wall clock; the two driver
        # runs may cross a second boundary — not a semantic difference
        return re.sub(rb"<LastChange>[^<]*</LastChange>", b"<LastChange/>",
                      path.read_bytes())

    for i in range(5):
        a = normalized(tmp_path / "seq" / "page" / f"p{i}.xml.xml")
        b = normalized(tmp_path / "pipe" / "page" / f"p{i}.xml.xml")
        assert a == b, f"page {i} xml differs between drivers"
    seq_clusters = sorted(
        p for p in (tmp_path / "seq" / "clustering").rglob("*.xml"))
    pipe_clusters = sorted(
        p for p in (tmp_path / "pipe" / "clustering").rglob("*.xml"))
    assert len(seq_clusters) == len(pipe_clusters) == 5
    for a, b in zip(seq_clusters, pipe_clusters):
        assert normalized(a) == normalized(b), f"{a} differs"


@pytest.mark.parametrize("extract_mode", ["gather2", "native"])
def test_full_workflow_pipelined_device_swt_matches_sequential(
        tmp_path, extract_mode, monkeypatch):
    """The PRODUCTION on-chip shape — wave loop + heading device-SWT
    per-line feature programs (fused_drain_dispatch staging) — forced onto
    the CPU backend and byte-compared against the sequential driver with
    the host SWT path. Tags (hence bytes) must match: the device per-line
    features are pinned bit-exact to the host ones in test_swt_device.
    ``native`` runs the round-4 host-C per-line stats over the
    prefetched DT readback (geometry/native.line_stats_native)."""
    monkeypatch.setenv("CITLAB_SWT_EXTRACT", extract_mode)
    if extract_mode == "native":
        from citlab_as_tpu.geometry.native import native_available
        if not native_available():
            pytest.skip("native kernel unavailable")
    import re
    import shutil
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import (
        run_full_workflow, run_full_workflow_pipelined)
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def ckpt(name):
        d = os.path.join(repo, "models_ckpt", name)
        return d if os.path.isdir(d) else None

    corpora = {}
    for variant in ("seq", "pipe"):
        work = tmp_path / variant
        work.mkdir()
        rng = np.random.RandomState(3)
        corpora[variant] = [
            make_demo_page(str(work), f"p{i}", rng, w=500, h=700)[0]
            for i in range(3)]

    sep = SegmentationPredictor(ckpt("separator"))
    head = SegmentationPredictor(ckpt("heading"))
    gnn = RelationPredictor(ckpt(os.path.join("gnn", "best", "f1")))

    kw = dict(separator_fixed_height=512, heading_fixed_height=384,
              batch_size=2)
    run_full_workflow(
        corpora["seq"], out_dir=str(tmp_path / "seq_out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        heading_device_swt=False, **kw)
    res = run_full_workflow_pipelined(
        corpora["pipe"], out_dir=str(tmp_path / "pipe_out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        force=True, heading_device_swt=True, **kw)
    assert len(res["clustered"]) == 3

    def normalized(path):
        return re.sub(rb"<LastChange>[^<]*</LastChange>", b"<LastChange/>",
                      path.read_bytes())

    for i in range(3):
        a = normalized(tmp_path / "seq" / "page" / f"p{i}.xml.xml")
        b = normalized(tmp_path / "pipe" / "page" / f"p{i}.xml.xml")
        assert a == b, f"page {i} xml differs (device-SWT pipelined vs host)"


def test_textregion_save_node_reuse_byte_equal(tmp_path):
    """The move-based textregion save (reuse_line_nodes=True) must produce
    byte-identical PAGE-XML to the object-serialization rebuild on pipeline
    pages (it only relocates existing TextLine nodes + rewrites custom)."""
    import shutil
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_e2e import make_demo_page
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.textregion import (
        _create_regions_fast, save_results_in_pagexml)

    rng = np.random.RandomState(11)
    make_demo_page(str(tmp_path), "p0", rng, w=500, h=700)
    src = tmp_path / "page" / "p0.xml"
    cluster_page(str(src))

    outs = {}
    for variant, reuse in (("move", True), ("rebuild", False)):
        copy = tmp_path / f"{variant}.xml"
        shutil.copy(src, copy)
        region_dict = _create_regions_fast(
            str(copy), des_dist=50, max_d=100, alpha=75)
        assert region_dict, "native fast path must be available in CI"
        save_results_in_pagexml(str(copy), region_dict,
                                reuse_line_nodes=reuse)
        text = copy.read_text()
        # LastChange timestamps differ between the two writes
        outs[variant] = re.sub(r"<LastChange>[^<]*</LastChange>", "", text)
    assert outs["move"] == outs["rebuild"]
