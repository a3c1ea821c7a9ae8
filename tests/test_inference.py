"""Inference wrapper tests: checkpoint round trips into predictors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
from citlab_as_tpu.models.arunet import ARUNet
from citlab_as_tpu.train.checkpoint import save_checkpoint


def test_segmentation_predictor_random(caplog):
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32)
    out = pred(np.zeros((40, 50), np.float32))
    assert out.shape == (40, 50, 2)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-3)


def test_segmentation_predictor_checkpoint_roundtrip(tmp_path):
    # save a checkpoint with a known bias and confirm the predictor loads it
    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 1), jnp.float32))
    save_checkpoint(str(tmp_path), 0, {"params": variables})
    pred = SegmentationPredictor(model_dir=str(tmp_path), pad_multiple=32)
    ref_logit_bias = np.asarray(
        variables["params"]["logit"]["conv"]["bias"])
    got_bias = np.asarray(pred.variables["params"]["logit"]["conv"]["bias"])
    np.testing.assert_allclose(got_bias, ref_logit_bias)
    # missing dir raises
    with pytest.raises(FileNotFoundError):
        SegmentationPredictor(model_dir=str(tmp_path / "nope"))


def test_segmentation_predict_batch():
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32)
    outs = pred.predict_batch([np.zeros((30, 40), np.float32),
                               np.zeros((32, 48), np.float32)])
    assert outs[0].shape == (30, 40, 2)
    assert outs[1].shape == (32, 48, 2)


def test_relation_predictor_confidences():
    pred = RelationPredictor(model_dir=None, node_buckets=[8])
    graph = {
        "num_nodes": 3,
        "interacting_nodes": [[0, 1], [1, 2], [2, 0]],
        "num_interacting_nodes": 3,
        "node_features": np.random.RandomState(0).rand(3, 15).tolist(),
        "edge_features": np.random.RandomState(1).rand(3, 2).tolist(),
    }
    conf = pred(graph)
    assert conf.shape == (3, 3)
    assert np.all((conf >= 0) & (conf <= 1))
    # second call reuses params and bucket-compiled program
    conf2 = pred(graph)
    np.testing.assert_allclose(conf, conf2)


def test_relation_predictor_feature_masks():
    pred = RelationPredictor(model_dir=None,
                             node_feature_mask=[1] * 7 + [0] * 8,
                             node_buckets=[8])
    graph = {
        "num_nodes": 2,
        "interacting_nodes": [[0, 1]],
        "num_interacting_nodes": 1,
        "node_features": np.random.RandomState(0).rand(2, 15).tolist(),
        "edge_features": np.random.RandomState(1).rand(1, 2).tolist(),
    }
    conf = pred(graph)
    assert conf.shape == (2, 2)
