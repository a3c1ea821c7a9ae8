"""GNN model tests: edge correction, sampling, forward semantics, training."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from citlab_as_tpu.models.gnn.graph import (
    correct_edges, sample_relations, build_full_relations,
    fully_connected_edges, pad_graph, batch_graphs,
)
from citlab_as_tpu.models.gnn.model import GraphRelation, GraphGNN
from citlab_as_tpu.models.gnn.loss import relation_loss, relation_metrics


# ---------------------------------------------------------------- host graph
def test_fully_connected_edges():
    e = fully_connected_edges(3)
    assert e.shape == (6, 2)
    assert not any((a == b) for a, b in e)


def test_correct_edges_undirect_dedup_selfloops():
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 2]], np.int32)
    feats = np.array([[1.0], [2.0], [3.0], [4.0]], np.float32)
    out_e, out_f = correct_edges(edges, feats, num_nodes=3, undirected=True)
    # expect sorted encoded: (0,1), (1,0), (1,2), (2,1); self-loop dropped
    assert out_e.tolist() == [[0, 1], [1, 0], [1, 2], [2, 1]]
    # (0,1) keeps feature of first occurrence [1.0]; (1,0) existed at idx 1
    assert out_f[:, 0].tolist() == [1.0, 2.0, 3.0, 3.0]


def test_correct_edges_directed():
    edges = np.array([[2, 1], [0, 1], [2, 1]], np.int32)
    out_e, _ = correct_edges(edges, None, num_nodes=3, undirected=False)
    assert out_e.tolist() == [[0, 1], [2, 1]]


def test_sample_relations_balance():
    gt = np.array([[1, 0, 1], [1, 1, 0], [1, 2, 3], [1, 3, 2]], np.int32)
    rng = random.Random(0)
    rels, num, gts = sample_relations(10, gt, sample_num=8, num_classes=2,
                                      rel_components=2, rng=rng)
    assert num == len(rels) == len(gts)
    assert (gts == 1).sum() <= 4
    assert (gts == 0).sum() <= 4
    # negatives are not GT pairs
    gt_set = {(0, 1), (1, 0), (2, 3), (3, 2)}
    for rel, g in zip(rels, gts):
        if g == 0:
            assert tuple(rel) not in gt_set


def test_build_full_relations():
    gt = np.array([[1, 0, 1], [1, 1, 0]], np.int32)
    rels, num, gts = build_full_relations(3, gt)
    assert num == 9
    gt_mat = gts.reshape(3, 3)
    assert gt_mat[0, 1] == 1 and gt_mat[1, 0] == 1 and gt_mat[0, 2] == 0


# ---------------------------------------------------------------- device GNN
def _tiny_batch(b=2, n=4, dn=5, de=2, r=6, seed=0):
    rng = np.random.RandomState(seed)
    graphs = []
    for i in range(b):
        num_nodes = n - i  # vary sizes to exercise masks
        node_feats = rng.rand(num_nodes, dn).astype(np.float32)
        edges = fully_connected_edges(num_nodes)
        edge_feats = rng.rand(len(edges), de).astype(np.float32)
        edges, edge_feats = correct_edges(edges, edge_feats, num_nodes)
        rels, num_rels, gts = build_full_relations(
            num_nodes, np.array([[1, 0, 1], [1, 1, 0]], np.int32))
        graphs.append(pad_graph(num_nodes, node_feats, edges, edge_feats,
                                rels[:r], gts[:r], n, n * n, r))
    return batch_graphs(graphs)


def test_graph_relation_forward_shapes():
    batch = _tiny_batch()
    model = GraphRelation(num_classes=2)
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), inputs)
    logits = model.apply(variables, inputs)
    assert logits.shape == (2, 6, 2)
    conf = model.predict_confidences(variables, inputs)
    assert conf.shape == (2, 6)
    assert np.all((np.asarray(conf) >= 0) & (np.asarray(conf) <= 1))


def test_padding_invariance():
    """Padded nodes/edges must not influence the real nodes' outputs."""
    rng = np.random.RandomState(3)
    n_real = 3
    node_feats = rng.rand(n_real, 4).astype(np.float32)
    edges, edge_feats = correct_edges(
        fully_connected_edges(n_real), rng.rand(6, 2).astype(np.float32), n_real)
    rels, _, gts = build_full_relations(n_real, None)

    model = GraphRelation(num_classes=2)

    def run(max_nodes, max_edges, max_rels):
        g = pad_graph(n_real, node_feats, edges, edge_feats, rels, gts,
                      max_nodes, max_edges, max_rels)
        batch = batch_graphs([g])
        inputs = {k: jnp.asarray(v) for k, v in batch.items()}
        variables = model.init(jax.random.PRNGKey(7), inputs)
        return variables, model.apply(variables, inputs)

    v1, out_small = run(3, 8, 9)
    # re-run with same params but bigger padding
    g2 = pad_graph(n_real, node_feats, edges, edge_feats, rels, gts, 6, 20, 12)
    batch2 = batch_graphs([g2])
    inputs2 = {k: jnp.asarray(v) for k, v in batch2.items()}
    out_big = model.apply(v1, inputs2)
    np.testing.assert_allclose(
        np.asarray(out_small[0, :9]), np.asarray(out_big[0, :9]),
        rtol=2e-4, atol=2e-5)


def test_gnn_zero_steps_passthrough():
    batch = _tiny_batch()
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    model = GraphRelation(num_classes=2, gnn_params={"num_transition_steps": 0})
    variables = model.init(jax.random.PRNGKey(0), inputs)
    logits = model.apply(variables, inputs)
    assert logits.shape == (2, 6, 2)
    # no GNN params created
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("message_fn" in n for n in names)


def test_attention_and_max_aggregation_variants():
    batch = _tiny_batch()
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    for mp in [
        {"use_attention": True, "num_attention_heads": 2,
         "multihead_attention_merge_type": "concat"},
        {"use_attention": True, "num_attention_heads": 2,
         "multihead_attention_merge_type": "average"},
        {"aggregation_type": "max"},
    ]:
        model = GraphRelation(num_classes=2, message_params=mp)
        variables = model.init(jax.random.PRNGKey(0), inputs)
        logits = model.apply(variables, inputs)
        assert np.isfinite(np.asarray(logits)).all(), mp


def test_output_type_variants():
    batch = _tiny_batch()
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    for out_type in ["add_final_hidden_and_input", "concat_final_hidden_and_input"]:
        model = GraphRelation(num_classes=2, gnn_params={"output_type": out_type})
        variables = model.init(jax.random.PRNGKey(0), inputs)
        logits = model.apply(variables, inputs)
        assert logits.shape == (2, 6, 2)


def test_relation_loss_and_training_reduces_loss():
    batch = _tiny_batch()
    inputs = {k: jnp.asarray(v) for k, v in batch.items()}
    model = GraphRelation(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(variables)

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(v):
            logits = model.apply(v, inputs, train=False)
            return relation_loss(
                logits, inputs["relations_to_consider_gt"],
                inputs["num_relations_to_consider"],
                params=v["params"], weight_decay=1e-6)
        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(variables, updates), opt_state, loss

    losses = []
    for _ in range(30):
        variables, opt_state, loss = step(variables, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_relation_metrics():
    conf = np.array([[0.9, 0.1, 0.8, 0.3]])
    gt = np.array([[1, 0, 1, 1]])
    num = np.array([4])
    m = relation_metrics(conf, gt, num)
    assert m["accuracy"] == 0.75
    assert m["precision"] == 1.0
    assert m["recall"] == pytest.approx(2 / 3)
    # masked-out relations ignored
    m2 = relation_metrics(conf, gt, np.array([2]))
    assert m2["accuracy"] == 1.0


def test_relation_curves_consistent_with_sklearn():
    """Streaming PR/ROC curve points (misc.py:550-638 parity) agree with
    sklearn's exact curves at the bucket resolution."""
    from citlab_as_tpu.models.gnn.loss import relation_curves

    rng = np.random.RandomState(0)
    conf = rng.rand(4, 50).astype(np.float32)
    gt = (rng.rand(4, 50) > 0.6).astype(np.int32)
    num = np.asarray([50, 30, 50, 10], np.int32)
    curves = relation_curves(conf, gt, num, num_thresholds=101)
    assert len(curves["thresholds"]) == 101
    assert len(curves["precision"]) == 101
    # threshold 0 -> everything positive: recall 1, fpr 1
    assert curves["recall"][0] == 1.0
    assert curves["fpr"][0] == 1.0
    # threshold 1 (above max bucket) -> nothing positive
    assert curves["recall"][-1] == 0.0 and curves["fpr"][-1] == 0.0
    # monotone: recall and fpr non-increasing in threshold
    assert all(a >= b for a, b in zip(curves["recall"], curves["recall"][1:]))
    assert all(a >= b for a, b in zip(curves["fpr"], curves["fpr"][1:]))
    # AUC from the curve matches sklearn ROC-AUC within bucket resolution
    from sklearn.metrics import roc_auc_score
    mask = np.arange(50)[None, :] < num[:, None]
    auc_ref = roc_auc_score(gt[mask], conf[mask])
    fpr = np.asarray(curves["fpr"])[::-1]
    tpr = np.asarray(curves["tpr"])[::-1]
    auc_curve = np.trapezoid(tpr, fpr)
    assert abs(auc_curve - auc_ref) < 0.02


def test_trainer_exports_curves(tmp_path):
    """export_curves=True writes per-eval-epoch PR/ROC JSONs."""
    import json
    from citlab_as_tpu.train.trainer import TrainerGNN
    from tests.test_training import _write_graph_jsons

    jsons = _write_graph_jsons(tmp_path, n_graphs=3)
    trainer = TrainerGNN(
        str(tmp_path / "model"), jsons[:2], jsons[2:],
        flags={"epochs": 1, "samples_per_epoch": 4, "batch_size": 2,
               "export_curves": True})
    trainer.train()
    curves_file = tmp_path / "model" / "curves" / "epoch_0000.json"
    assert curves_file.exists()
    curves = json.loads(curves_file.read_text())
    assert {"thresholds", "precision", "recall", "fpr", "tpr"} <= set(curves)
