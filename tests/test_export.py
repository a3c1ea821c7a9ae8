"""Frozen-export round trips (the reference's .pb export analog)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_load_roundtrip_arunet(tmp_path):
    from citlab_as_tpu.models.arunet import ARUNet
    from citlab_as_tpu.train.export import export_frozen, load_frozen

    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    out = str(tmp_path / "m.frozen")
    export_frozen(out, "arunet", variables,
                  model_kwargs={"n_classes": 2, "dtype": jnp.bfloat16},
                  metadata={"note": "test"})
    model2, vars2, meta = load_frozen(out)
    assert meta["note"] == "test"
    assert model2.n_classes == 2 and model2.dtype == jnp.bfloat16

    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    y1, _ = model.apply(variables, x)
    y2, _ = model2.apply(vars2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_export_unknown_architecture(tmp_path):
    from citlab_as_tpu.train.export import export_frozen
    with pytest.raises(ValueError, match="Unknown architecture"):
        export_frozen(str(tmp_path / "x.frozen"), "nope", {"params": {}})


def test_segmentation_predictor_accepts_frozen(tmp_path):
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.models.arunet import ARUNet
    from citlab_as_tpu.train.export import export_frozen

    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    out = str(tmp_path / "seg.frozen")
    export_frozen(out, "arunet", variables,
                  model_kwargs={"n_classes": 2, "dtype": jnp.bfloat16})
    pred = SegmentationPredictor(out, pad_multiple=32)
    probs = pred(np.zeros((40, 48), np.float32))
    assert probs.shape == (40, 48, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)
    got = np.asarray(pred.variables["params"]["logit"]["conv"]["bias"])
    np.testing.assert_allclose(
        got, np.asarray(variables["params"]["logit"]["conv"]["bias"]))


def test_relation_predictor_accepts_frozen(tmp_path):
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.models.gnn.graph import (
        build_full_relations, correct_edges, fully_connected_edges, pad_graph,
        batch_graphs,
    )
    from citlab_as_tpu.models.gnn.model import GraphRelation
    from citlab_as_tpu.train.export import export_frozen

    rng = np.random.RandomState(0)
    n = 3
    edges, efeats = correct_edges(
        fully_connected_edges(n), rng.rand(6, 2).astype(np.float32), n)
    rels, _, gts = build_full_relations(n, None)
    g = pad_graph(n, rng.rand(n, 15).astype(np.float32), edges, efeats,
                  rels, gts, 8, 16, 64)
    batch = {k: jnp.asarray(v) for k, v in batch_graphs([g]).items()}
    model = GraphRelation(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = str(tmp_path / "gnn.frozen")
    export_frozen(out, "graph_relation", variables,
                  model_kwargs={"num_classes": 2})

    pred = RelationPredictor(out, node_buckets=[8])
    graph = {"num_nodes": n, "interacting_nodes": edges.tolist(),
             "num_interacting_nodes": len(edges),
             "node_features": rng.rand(n, 15).tolist(),
             "edge_features": rng.rand(len(edges), 2).tolist()}
    conf = pred(graph)
    assert conf.shape == (n, n)
    assert np.all((conf >= 0) & (conf <= 1))


def test_export_cli_from_trained_checkpoint(tmp_path):
    sep_ckpt = os.path.join(REPO, "models_ckpt", "separator")
    if not os.path.isdir(sep_ckpt):
        pytest.skip("no separator checkpoint")
    from citlab_as_tpu.cli.run_export import main
    from citlab_as_tpu.inference import SegmentationPredictor

    out = str(tmp_path / "sep.frozen")
    main(["--checkpoint_dir", sep_ckpt, "--architecture", "arunet",
          "--out", out, "--model_kwargs", '{"n_classes": 2, "dtype": "bfloat16"}'])
    assert os.path.exists(out)
    pred = SegmentationPredictor(out, pad_multiple=32)
    probs = pred(np.zeros((64, 64), np.float32))
    assert probs.shape == (64, 64, 2)
