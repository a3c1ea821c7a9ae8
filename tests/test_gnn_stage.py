"""GNN feature generation + clustering stage tests (end-to-end through JSON
and PAGE-XML file contracts)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.pagexml import Page
from citlab_as_tpu.stages.clustering import (
    DBScanRelation, TextblockClustering, kneedle_elbow,
)
from citlab_as_tpu.stages.features import (
    build_input_and_target, delaunay_edges, generate_feature_jsons,
    is_aligned_heading_separated, is_aligned_horizontally_separated,
    is_horizontally_separated, is_vertically_separated,
)
from citlab_as_tpu.stages.gnn_io import (
    gnn_clustering_for_page, load_conf_from_json, mask_separated_confs,
    save_conf_to_json, save_clustering_to_page, conf_to_cluster,
)
from citlab_as_tpu.stages.textblock_similarity import (
    TextblockSimilarity, normalized_cos_sim,
)


W, H = 1000, 1200

REGION_TPL = """<TextRegion id="{rid}" type="{rtype}">
  <Coords points="{x0},{y0} {x1},{y0} {x1},{y1} {x0},{y1}"/>
  <TextLine id="{rid}_tl0" custom="structure {{id:{aid}; type:article;}}">
    <Coords points="{x0},{y0} {x1},{y0} {x1},{ym} {x0},{ym}"/>
    <Baseline points="{x0},{by0} {x1},{by0}"/>
    <TextEquiv><Unicode>some text here for the line</Unicode></TextEquiv>
  </TextLine>
  <TextLine id="{rid}_tl1" custom="structure {{id:{aid}; type:article;}}">
    <Coords points="{x0},{ym} {x1},{ym} {x1},{y1} {x0},{y1}"/>
    <Baseline points="{x0},{by1} {x1},{by1}"/>
    <TextEquiv><Unicode>more words in the second line</Unicode></TextEquiv>
  </TextLine>
</TextRegion>"""

SEP_TPL = """<SeparatorRegion id="{sid}" custom="structure {{orientation:{orient};}}">
  <Coords points="{pts}"/>
</SeparatorRegion>"""

PAGE_TPL = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="p1.png" imageWidth="{w}" imageHeight="{h}">
{body}
  </Page>
</PcGts>
"""


def _region(rid, aid, x0, y0, x1, y1, rtype="paragraph"):
    ym = (y0 + y1) // 2
    return REGION_TPL.format(rid=rid, aid=aid, x0=x0, y0=y0, x1=x1, y1=y1,
                             ym=ym, by0=ym - 10, by1=y1 - 10, rtype=rtype)


@pytest.fixture
def workdir(tmp_path):
    """Two articles: a1 = two stacked regions left column; a2 = right column.
    A vertical separator between columns, horizontal separator inside left."""
    body = "\n".join([
        _region("tr_0", "a1", 50, 100, 450, 400),
        _region("tr_1", "a1", 50, 500, 450, 800, rtype="heading"),
        _region("tr_2", "a2", 550, 100, 950, 800),
        SEP_TPL.format(sid="sep_v", orient="vertical",
                       pts="495,50 505,50 505,1150 495,1150"),
        SEP_TPL.format(sid="sep_h", orient="horizontal",
                       pts="50,440 450,440 450,450 50,450"),
    ])
    img = np.full((H, W), 255, np.uint8)
    img[120:140, 60:440] = 0  # some strokes so SWT has content
    img[520:560, 60:440] = 0
    img[120:140, 560:940] = 0
    Image.fromarray(img).save(tmp_path / "p1.png")
    (tmp_path / "page").mkdir()
    (tmp_path / "page" / "p1.xml").write_text(
        PAGE_TPL.format(w=W, h=H, body=body))
    return tmp_path


# ---------------------------------------------------------------- features
def test_separator_bb_rules():
    # A left of sep, B right of sep, both vertically overlapping sep
    assert is_vertically_separated(0, 40, 0, 100, 60, 100, 0, 100,
                                   45, 55, 0, 100)
    # A above sep, B below, not both on one side
    assert is_horizontally_separated(0, 100, 0, 40, 0, 100, 60, 100,
                                     0, 100, 45, 55)
    # both left of the separator -> no horizontal separation
    assert not is_horizontally_separated(0, 10, 0, 40, 0, 10, 60, 100,
                                         50, 100, 45, 55)


def test_build_input_and_target_schema(workdir):
    page_path = str(workdir / "page" / "p1.xml")
    out = build_input_and_target(page_path, interaction="delaunay",
                                 visual_regions=True, separators="bb")
    assert out["num_nodes"] == 3
    assert len(out["node_features"]) == 3
    assert all(len(f) == 15 for f in out["node_features"])
    assert out["num_interacting_nodes"] == len(out["interacting_nodes"])
    assert all(len(f) == 2 for f in out["edge_features"])
    # heading flag set on tr_1 (third region order is document order)
    heading_flags = [f[14] for f in out["node_features"]]
    assert heading_flags == [0.0, 1.0, 0.0]
    # GT: tr_0 and tr_1 same article
    gt = {(r[1], r[2]) for r in out["gt_relations"]}
    assert (0, 1) in gt and (1, 0) in gt and (0, 2) not in gt
    # visual regions present
    assert len(out["visual_regions_nodes"]) == 3
    assert out["num_points_visual_regions_nodes"] == [4, 4, 4]

    # separator features: edge (0, 2) crosses the vertical separator
    for (a, b), feat in zip(out["interacting_nodes"], out["edge_features"]):
        if {a, b} == {0, 2} or {a, b} == {1, 2}:
            assert feat[1] == 1.0, (a, b, feat)
        if {a, b} == {0, 1}:
            assert feat[0] == 1.0, (a, b, feat)  # horizontal separator


def test_line_separator_variant(workdir):
    page_path = str(workdir / "page" / "p1.xml")
    out = build_input_and_target(page_path, separators="line")
    for (a, b), feat in zip(out["interacting_nodes"], out["edge_features"]):
        if {a, b} == {0, 2}:
            assert feat[1] == 1.0


def test_generate_feature_jsons_default_dir(workdir):
    page_path = str(workdir / "page" / "p1.xml")
    written = generate_feature_jsons([page_path], visual_regions=True,
                                     separators="bb", interaction="delaunay")
    assert len(written) == 1
    # default dir naming json{n}{i}{e}{v}{sep}
    assert os.path.basename(os.path.dirname(written[0])) == "json15d2vbb"
    with open(written[0]) as f:
        data = json.load(f)
    assert data["num_nodes"] == 3
    assert data["gt_num_relations"] == len(data["gt_relations"])


def test_generate_feature_jsons_reuses_heading_line_features(workdir, monkeypatch):
    """The workflow drivers hand the heading stage's device-computed per-line
    (bbox, stroke, height) to the features stage; when every line matches by
    id and Rectangle bbox (w = max - min + 1 — the heading convention), the
    host distance transform must be skipped entirely. Regression: a bbox
    convention mismatch made this reuse silently dead (always recomputing)."""
    from citlab_as_tpu.ops.swt import StrokeWidthDistanceTransform

    page_path = str(workdir / "page" / "p1.xml")
    lf = {}
    for tl in Page(page_path).get_textlines():
        bb = tl.surr_p.to_polygon().get_bounding_box()
        lf[tl.id] = ((bb.x, bb.y, bb.width, bb.height), 2.5, 30)

    def boom(self, *a, **k):
        raise AssertionError("host distance transform must not run")
    monkeypatch.setattr(StrokeWidthDistanceTransform, "distance_transform", boom)

    written = generate_feature_jsons(
        [page_path], visual_regions=False, separators="bb",
        line_features={page_path: lf})
    with open(written[0]) as f:
        data = json.load(f)
    # stroke/height features present and page-max normalized from the
    # precomputed values
    assert data["num_nodes"] == 3
    assert all(abs(f[12] - 1.0) < 1e-9 for f in data["node_features"])


def test_delaunay_edges_structure():
    rng = np.random.RandomState(0)
    pts = rng.rand(10, 2) * 1000
    edges = delaunay_edges(10, pts)
    assert edges.shape[1] == 2
    # symmetric neighbor structure
    pairs = {tuple(e) for e in edges.tolist()}
    assert all((b, a) in pairs for a, b in pairs)


# ---------------------------------------------------------------- similarity
def test_textblock_similarity():
    vectors = {"cat": np.array([1.0, 0.0]), "dog": np.array([0.9, 0.1]),
               "stock": np.array([0.0, 1.0]), "market": np.array([0.1, 1.0])}
    sim = TextblockSimilarity(language="english", word_vectors=vectors)
    sim.set_tb_dict({
        "tr_a": "the cat and the dog play well together",
        "tr_b": "a dog and a cat sat on the mat",
        "tr_c": "the stock market rally continued strongly today",
    })
    sim.run()
    fd = sim.feature_dict["edge_features"]
    assert fd["tr_a"]["tr_b"][0] > fd["tr_a"]["tr_c"][0]
    assert fd["tr_a"]["tr_b"] == fd["tr_b"]["tr_a"]
    assert normalized_cos_sim(np.zeros(2), np.ones(2)) == 0.5


# ---------------------------------------------------------------- clustering
def _block_conf(n1=3, n2=3, p_in=0.9, p_out=0.1):
    n = n1 + n2
    conf = np.full((n, n), p_out)
    conf[:n1, :n1] = p_in
    conf[n1:, n1:] = p_in
    np.fill_diagonal(conf, 1.0)
    return conf


@pytest.mark.parametrize("method", ["greedy", "dbscan", "dbscan_std", "linkage"])
def test_clustering_methods_find_two_blocks(method):
    tb = TextblockClustering()
    tb.set_confs(_block_conf())
    tb.calc(method)
    labels = list(tb.tb_labels)
    assert len(set(labels[:3])) == 1
    assert len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


def test_two_region_special_case():
    tb = TextblockClustering()
    tb.set_confs(np.array([[1.0, 0.8], [0.8, 1.0]]))
    tb.calc("greedy")
    assert list(tb.tb_labels) == [1, 1]
    tb.set_confs(np.array([[1.0, 0.2], [0.2, 1.0]]))
    tb.calc("greedy")
    assert list(tb.tb_labels) == [1, 2]


def test_dbscan_relation_agreement_gate():
    # node 3 connected to node 2 but poorly to the rest of the cluster
    conf = np.array([
        [1.0, 0.9, 0.9, 0.1],
        [0.9, 1.0, 0.9, 0.1],
        [0.9, 0.9, 1.0, 0.6],
        [0.1, 0.1, 0.6, 1.0],
    ])
    scanner = DBScanRelation(cluster_agreement_threshold=0.5)
    labels = scanner.cluster_relations(4, conf)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]  # mean conf to cluster = (0.1+0.1+0.6)/3 < 0.5


def test_kneedle_elbow():
    x = np.arange(1, 11)
    y = np.array([100, 50, 25, 12, 10, 9, 8.5, 8, 7.8, 7.7])
    elbow = kneedle_elbow(x, y)
    assert elbow is not None and 2 <= elbow <= 5


def test_rel_llh_sign():
    tb = TextblockClustering()
    tb.set_confs(_block_conf())
    tb.calc("greedy")
    assert tb.rel_LLH > 0  # merging high-confidence pairs gives positive LLH


# ---------------------------------------------------------------- gnn io
def test_conf_json_roundtrip(workdir, tmp_path):
    page_path = str(workdir / "page" / "p1.xml")
    confs = np.array([[1.0, 0.8, 0.2], [0.6, 1.0, 0.3], [0.2, 0.3, 1.0]])
    out = save_conf_to_json(confs, page_path, str(tmp_path / "out"))
    loaded = load_conf_from_json(out)
    assert loaded.shape == (3, 3)
    # symmetrized with gmean
    assert loaded[0, 1] == pytest.approx(np.sqrt(0.8 * 0.6), rel=1e-6)


def test_save_clustering_to_page(workdir, tmp_path):
    page_path = str(workdir / "page" / "p1.xml")
    out = save_clustering_to_page([1, 1, 2], page_path, str(tmp_path / "out"),
                                  info="test_method")
    assert out.endswith("_clustering.xml")
    assert os.sep + "clustering" + os.sep in out and "test_method" in out
    page = Page(out)
    art = page.get_article_dict()
    assert set(art.keys()) == {"a1", "a2"}


def test_mask_separated_confs(workdir):
    page_path = str(workdir / "page" / "p1.xml")
    confs = np.full((3, 3), 0.9)
    masked = mask_separated_confs(confs, page_path, mask_horizontally=True,
                                  mask_headings=False)
    # tr_0 and tr_1 are same-column separated by the horizontal separator
    assert masked[0, 1] == 0 and masked[1, 0] == 0
    assert masked[0, 2] == 0.9


def test_gnn_clustering_for_page_end_to_end(workdir, tmp_path):
    """Full stage: features json -> GNN (random init) -> clustering pagexml."""
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.gnn import GraphRelation, correct_edges, build_full_relations
    from citlab_as_tpu.models.gnn.graph import pad_graph, batch_graphs

    page_path = str(workdir / "page" / "p1.xml")
    json_path = generate_feature_jsons([page_path], visual_regions=False,
                                       separators="bb")[0]

    model = GraphRelation(num_classes=2)
    state = {}

    def confidence_fn(graph):
        n = graph["num_nodes"]
        edges, efeats = correct_edges(
            np.asarray(graph["interacting_nodes"], np.int32),
            np.asarray(graph["edge_features"], np.float32), n)
        rels, _, _ = build_full_relations(n, None)
        g = pad_graph(n, np.asarray(graph["node_features"], np.float32),
                      edges, efeats, rels, None, n, len(edges), n * n)
        batch = {k: jnp.asarray(v) for k, v in batch_graphs([g]).items()}
        if "vars" not in state:
            state["vars"] = model.init(jax.random.PRNGKey(0), batch)
        conf = model.predict_confidences(state["vars"], batch)
        return np.asarray(conf[0]).reshape(n, n)

    out = gnn_clustering_for_page(
        json_path, confidence_fn, clustering_method="dbscan",
        save_conf=True, out_dir=str(tmp_path / "out"))
    assert out is not None and os.path.exists(out)
    page = Page(out)
    # every line has an article id now
    assert all(tl.get_article_id() for tl in page.get_textlines())
