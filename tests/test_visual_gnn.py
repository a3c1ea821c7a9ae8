"""Inception v3 backbone + GNN visual branch tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from citlab_as_tpu.models.gnn.graph import (
    batch_graphs, build_full_relations, correct_edges, fully_connected_edges,
    pad_graph,
)
from citlab_as_tpu.models.gnn.model import GraphRelation
from citlab_as_tpu.models.gnn.visual import (
    VisualFeatureExtractor, _bbox_from_regions, normalize_visual_regions,
    region_max_pool,
)
from citlab_as_tpu.models.inception_v3 import InceptionV3


def test_inception_v3_endpoints():
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, eps = model.apply(variables, x)
    assert eps["Mixed_5d"].shape == (1, 35, 35, 288)
    assert eps["Mixed_6e"].shape == (1, 17, 17, 768)
    assert eps["Mixed_7c"].shape == (1, 8, 8, 2048)
    assert out is eps["Mixed_7c"]


def test_region_max_pool_exact():
    fm = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    # region covering relative x [0, 0.5), y [0, 0.5) -> cells (0..1, 0..1)
    xmin = jnp.array([[0.0]])
    xmax = jnp.array([[0.49]])
    ymin = jnp.array([[0.0]])
    ymax = jnp.array([[0.49]])
    out = region_max_pool(fm, xmin, xmax, ymin, ymax)
    assert float(out[0, 0, 0]) == 5.0  # max of cells {0,1,4,5}
    # full region -> global max
    out2 = region_max_pool(fm, jnp.array([[0.0]]), jnp.array([[0.99]]),
                           jnp.array([[0.0]]), jnp.array([[0.99]]))
    assert float(out2[0, 0, 0]) == 15.0


def test_bbox_from_regions_masks_padding():
    regions = np.zeros((1, 1, 2, 4), np.float32)
    regions[0, 0, 0] = [10, 20, 999, 999]  # x, last two are padding
    regions[0, 0, 1] = [5, 15, 999, 999]
    num_points = np.array([[2]])
    xmin, xmax, ymin, ymax = _bbox_from_regions(
        jnp.asarray(regions), jnp.asarray(num_points))
    assert float(xmin[0, 0]) == 10 and float(xmax[0, 0]) == 20
    assert float(ymin[0, 0]) == 5 and float(ymax[0, 0]) == 15


def test_normalize_visual_regions():
    regions = np.zeros((1, 1, 2, 1), np.float32)
    regions[0, 0, 0, 0] = 50   # x = 50 px
    regions[0, 0, 1, 0] = 25   # y = 25 px
    shape = np.array([[100, 200]])
    out = normalize_visual_regions(jnp.asarray(regions), jnp.asarray(shape),
                                   pad_image_height=100, pad_image_width=200)
    assert float(out[0, 0, 0, 0]) == pytest.approx(0.25)  # 50/200
    assert float(out[0, 0, 1, 0]) == pytest.approx(0.25)  # 25/100


def test_visual_feature_extractor_aru():
    extractor = VisualFeatureExtractor(
        backbone="ARU_v1", from_layers=("scale_0_unet_down_2_conv",
                                        "scale_0_unet_down_3_conv"),
        layer_compressed_dims=(8, 8))
    image = jnp.zeros((1, 64, 64, 1))
    image_shape = jnp.asarray([[64, 64]])
    regions = jnp.asarray(np.random.RandomState(0).rand(1, 3, 2, 4) * 64,
                          jnp.float32)
    num_points = jnp.full((1, 3), 4, jnp.int32)
    variables = extractor.init(jax.random.PRNGKey(0), image, image_shape,
                               regions, num_points)
    node_feats, edge_feats = extractor.apply(
        variables, image, image_shape, regions, num_points)
    assert node_feats.shape == (1, 3, 16)
    assert edge_feats is None


def test_graph_relation_with_visual_branch():
    rng = np.random.RandomState(0)
    n = 3
    node_feats = rng.rand(n, 7).astype(np.float32)
    edges, efeats = correct_edges(
        fully_connected_edges(n), rng.rand(6, 2).astype(np.float32), n)
    rels, _, gts = build_full_relations(n, None)
    g = pad_graph(n, node_feats, edges, efeats, rels, gts, n, len(edges), n * n)
    batch = {k: jnp.asarray(v) for k, v in batch_graphs([g]).items()}
    batch["image"] = jnp.zeros((1, 64, 64, 1))
    batch["image_shape"] = jnp.asarray([[64, 64]])
    batch["visual_regions_nodes"] = jnp.asarray(
        rng.rand(1, n, 2, 4) * 64, jnp.float32)
    batch["num_points_visual_regions_nodes"] = jnp.full((1, n), 4, jnp.int32)

    model = GraphRelation(
        num_classes=2, image_input=True, visual_backbone="ARU_v1")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits = model.apply(variables, batch)
    assert logits.shape == (1, n * n, 2)
    # visual params exist
    names = ["/".join(str(p) for p in path) for path, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("visual" in nm for nm in names)


def test_multi_resolution_feature_maps_conv_branch():
    """layer_depth>0 projects endpoints; empty from_layer builds stride-2
    maps (feature_map_generators.py:72-197)."""
    from citlab_as_tpu.models.gnn.visual import MultiResolutionFeatureMaps

    endpoints = {"a": jnp.ones((1, 16, 16, 8)), "b": jnp.ones((1, 8, 8, 12))}
    gen = MultiResolutionFeatureMaps(
        from_layers=("a", "b", "", ""), layer_depths=(-1, 32, 64, 64))
    variables = gen.init(jax.random.PRNGKey(0), endpoints)
    maps = gen.apply(variables, endpoints)
    assert maps[0].shape == (1, 16, 16, 8)      # passthrough
    assert maps[1].shape == (1, 8, 8, 32)       # 1x1 projection
    assert maps[2].shape == (1, 4, 4, 64)       # new stride-2 map
    assert maps[3].shape == (1, 2, 2, 64)       # chained stride-2 map
    assert all((np.asarray(m) >= 0).all() for m in maps)  # relu


def test_image_resizer_batch():
    from citlab_as_tpu.ops.image_utils import ImageResizer

    imgs = [np.ones((40, 60), np.float32), np.ones((30, 30), np.float32)]
    r = ImageResizer(imgs, scaling_factor=0.5)
    out = r.resize()
    assert out[0].shape == (20, 30) and out[1].shape == (15, 15)
    ratio, shapes = r.resize_ratio(min_dimension=20, max_dimension=32,
                                   pad_to_max_dimension=True)
    assert all(im.shape == (32, 32) for im in ratio)
    assert shapes[0][0] <= 32 and shapes[0][1] <= 32


def test_relation_predictor_with_visual_input():
    """image_input predictor consumes graph visual regions + page image."""
    from citlab_as_tpu.inference import RelationPredictor

    rng = np.random.RandomState(0)
    n = 3
    # bbox visual regions [N, 2, 4] as features.py writes them
    regions = []
    for i in range(n):
        x0, y0 = 50 + 120 * i, 40
        xs = [x0, x0 + 100, x0 + 100, x0]
        ys = [y0, y0, y0 + 200, y0 + 200]
        regions.append([xs, ys])
    graph = {
        "num_nodes": n,
        "interacting_nodes": [[0, 1], [1, 2], [0, 2]],
        "num_interacting_nodes": 3,
        "node_features": rng.rand(n, 15).tolist(),
        "edge_features": rng.rand(3, 2).tolist(),
        "visual_regions_nodes": regions,
        "num_points_visual_regions_nodes": [4] * n,
    }
    image = (rng.rand(400, 420) * 255).astype(np.uint8)

    pred = RelationPredictor(model_dir=None, image_input=True,
                             visual_backbone="ARU_v1", node_buckets=[8])
    conf = pred(graph, image=image)
    assert conf.shape == (n, n)
    assert np.all((conf >= 0) & (conf <= 1))
    names = ["/".join(str(p) for p in path) for path, _ in
             jax.tree_util.tree_leaves_with_path(pred.variables["params"])]
    assert any("visual" in nm for nm in names)


def test_gnn_clustering_for_page_visual(tmp_path):
    """gnn_clustering_for_page loads the page image for image_input
    predictors and writes the clustering page."""
    import json as json_mod
    from PIL import Image
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.stages.gnn_io import gnn_clustering_for_page

    rng = np.random.RandomState(1)
    n = 3
    regions = []
    for i in range(n):
        x0 = 20 + 60 * i
        regions.append([[x0, x0 + 50, x0 + 50, x0], [20, 20, 120, 120]])
    graph = {
        "num_nodes": n,
        "interacting_nodes": [[0, 1], [1, 2], [0, 2]],
        "num_interacting_nodes": 3,
        "node_features": rng.rand(n, 15).tolist(),
        "edge_features": rng.rand(3, 2).tolist(),
        "visual_regions_nodes": regions,
        "num_points_visual_regions_nodes": [4] * n,
    }
    (tmp_path / "json").mkdir()
    json_path = tmp_path / "json" / "v.json"
    json_path.write_text(json_mod.dumps(graph))

    # page + image for the writer
    lines = "".join(
        f'<TextRegion id="tr_{i}"><Coords points="{r[0][0]},{r[1][0]} '
        f'{r[0][1]},{r[1][1]} {r[0][2]},{r[1][2]} {r[0][3]},{r[1][3]}"/>'
        f'<TextLine id="tl_{i}"><Coords points="{r[0][0]},40 {r[0][1]},40 '
        f'{r[0][1]},60 {r[0][0]},60"/>'
        f'<Baseline points="{r[0][0]},55 {r[0][1]},55"/></TextLine>'
        f'</TextRegion>' for i, r in enumerate(regions))
    xml = ('<?xml version="1.0" encoding="UTF-8"?>'
           '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
           'pagecontent/2013-07-15"><Metadata><Creator>t</Creator>'
           '<Created>x</Created><LastChange>x</LastChange></Metadata>'
           '<Page imageFilename="v.png" imageWidth="220" imageHeight="160">'
           f'{lines}</Page></PcGts>')
    (tmp_path / "page").mkdir()
    (tmp_path / "page" / "v.xml").write_text(xml)
    Image.fromarray(np.full((160, 220), 255, np.uint8)).save(tmp_path / "v.png")

    pred = RelationPredictor(model_dir=None, image_input=True,
                             visual_backbone="ARU_v1", node_buckets=[8])
    out = gnn_clustering_for_page(
        str(json_path), pred, clustering_method="dbscan",
        page_path=str(tmp_path / "page" / "v.xml"))
    assert out is not None and os.path.exists(out)


@pytest.mark.slow
def test_aru_cutted_backbone():
    """Distinct ARU_cutted_v1 (ARU_cutted_v1.py:7-73): down path only, mvn
    standardization, featRoot 12 doubling per scale, no up path/logits."""
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.arunet import ARUCutted
    from citlab_as_tpu.models.backbones import get_backbone

    model = get_backbone("ARU_cutted_v1")
    assert isinstance(model, ARUCutted)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, endpoints = model.apply(variables, x)
    # 6 scales, featRoot 12 doubling: res_block_i has 12 * 2^i channels at
    # 64 / 2^i resolution
    assert sorted(endpoints) == [f"res_block_{i}" for i in range(6)]
    for i in range(6):
        fm = endpoints[f"res_block_{i}"]
        assert fm.shape == (1, 64 // 2 ** i, 64 // 2 ** i, 12 * 2 ** i)
    assert out.shape == (1, 2, 2, 384)
    # no up-path / logit params exist
    names = jax.tree_util.tree_leaves_with_path(variables)
    joined = ["/".join(str(p) for p in path) for path, _ in names]
    assert not any("up" in n or "logit" in n or "att" in n for n in joined)
    # parameter count is well below a full ARU forward's
    n_params = sum(np.prod(np.shape(l))
                   for _, l in jax.tree_util.tree_leaves_with_path(variables))
    assert n_params > 0


@pytest.mark.slow
def test_graph_relation_with_cutted_backbone():
    """GraphRelation(image_input, visual_backbone='ARU_cutted_v1') runs and
    produces per-relation logits."""
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.gnn.model import GraphRelation

    rng = np.random.RandomState(0)
    n = 3
    node_feats = rng.rand(n, 7).astype(np.float32)
    edges, efeats = correct_edges(
        fully_connected_edges(n), rng.rand(6, 2).astype(np.float32), n)
    rels, _, gts = build_full_relations(n, None)
    g = pad_graph(n, node_feats, edges, efeats, rels, gts, n, len(edges), n * n)
    batch = {k: jnp.asarray(v) for k, v in batch_graphs([g]).items()}
    batch["image"] = jnp.zeros((1, 64, 64, 1))
    batch["image_shape"] = jnp.asarray([[64, 64]])
    batch["visual_regions_nodes"] = jnp.asarray(
        rng.rand(1, n, 2, 4) * 64, jnp.float32)
    batch["num_points_visual_regions_nodes"] = jnp.full((1, n), 4, jnp.int32)

    model = GraphRelation(num_classes=2, image_input=True,
                          visual_backbone="ARU_cutted_v1")
    variables = model.init(jax.random.PRNGKey(0), batch)
    logits = model.apply(variables, batch)
    assert logits.shape == (1, n * n, 2)
    assert np.isfinite(np.asarray(logits)).all()
    # the cutted backbone has no up-path parameters
    names = ["/".join(str(p) for p in path) for path, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("res_block" in nm for nm in names)
    assert not any("unet_up" in nm for nm in names)
