"""Training infrastructure tests: schedules, pipeline, checkpoints, trainer."""
import json
import os

import numpy as np
import pytest

from citlab_as_tpu.models.gnn.graph import fully_connected_edges
from citlab_as_tpu.train.augmentation import augment_geometric_features
from citlab_as_tpu.train.checkpoint import (
    ema_update, export_best, read_epoch_info, restore_best,
    restore_checkpoint, save_checkpoint, warmstart_params, write_epoch_info,
)
from citlab_as_tpu.train.input_pipeline import (
    FileListIterablor, InputGNN, apply_feature_masks,
)
from citlab_as_tpu.train.lav import lav_relation
from citlab_as_tpu.train.optimizer import (
    build_optimizer, build_schedule, decay_schedule, final_decay_schedule,
    warmup_final_decay_schedule,
)
from citlab_as_tpu.train.trainer import TrainerGNN


# ---------------------------------------------------------------- schedules
def test_decay_schedule_staircase():
    s = decay_schedule(1.0, steps_per_epoch=10, learning_circle=3, lr_decay_rate=0.5)
    assert float(s(0)) == 1.0
    assert float(s(29)) == 1.0        # epoch 2, circle 0
    assert float(s(30)) == 0.5        # epoch 3, circle 1
    assert float(s(60)) == 0.25


def test_final_decay_cooldown():
    s = final_decay_schedule(1.0, steps_per_epoch=1, learning_circle=100,
                             lr_decay_rate=1.0, decay_fraction=0.1,
                             epochs=100, final_epochs=50)
    assert float(s(0)) == 1.0
    assert float(s(50)) == 1.0
    end = float(s(99))
    assert end < 0.15  # cooled near decay_fraction
    assert float(s(75)) < 1.0


def test_warmup_schedule():
    s = warmup_final_decay_schedule(1.0, steps_per_epoch=1, learning_circle=100,
                                    lr_decay_rate=1.0, decay_fraction=0.1,
                                    epochs=100, final_epochs=20,
                                    warmup_epochs=10, warmup_factor=10)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(5)) == pytest.approx(0.55)
    assert float(s(10)) == pytest.approx(1.0)


def test_build_optimizer_variants():
    for name in ["adam", "nadam", "rmsprop", "sgd"]:
        opt = build_optimizer({"optimizer": name}, 10, 100)
        assert opt is not None
    with pytest.raises(ValueError):
        build_optimizer({"optimizer": "nope"}, 10, 100)
    with pytest.raises(ValueError):
        build_schedule("nope", {}, 10, 100)


# ---------------------------------------------------------------- pipeline
def test_file_list_iterablor_cycles():
    it = FileListIterablor(["a", "b", "c"], shuffle=False)
    got = [next(it) for _ in range(7)]
    assert got[:3] == ["a", "b", "c"] and got[3:6] == ["a", "b", "c"]


def test_apply_feature_masks():
    f = np.arange(12).reshape(2, 6).astype(np.float32)
    out = apply_feature_masks(f, [1, 0, 1, 0, 0, 1])
    assert out.shape == (2, 3)
    assert out[0].tolist() == [0, 2, 5]


def test_augmentation_preserves_shape_and_changes_values():
    rng = np.random.RandomState(0)
    feats = np.random.RandomState(1).rand(5, 15).astype(np.float64)
    orig = feats.copy()
    changed = False
    for _ in range(10):
        out = augment_geometric_features(
            feats.copy(), ["scaling", "rotation", "translation"], rng)
        assert out.shape == orig.shape
        if not np.allclose(out, orig):
            changed = True
    assert changed


def _write_graph_jsons(tmp_path, n_graphs=4, n_nodes=5, seed=0):
    rng = np.random.RandomState(seed)
    paths = []
    for g in range(n_graphs):
        edges = fully_connected_edges(n_nodes)
        # two articles: nodes 0-2 and 3-4
        gt = [[1, i, j] for i in range(n_nodes) for j in range(n_nodes)
              if (i < 3) == (j < 3)]
        graph = {
            "num_nodes": n_nodes,
            "interacting_nodes": edges.tolist(),
            "num_interacting_nodes": len(edges),
            "node_features": rng.rand(n_nodes, 15).tolist(),
            "edge_features": rng.rand(len(edges), 2).tolist(),
            "gt_relations": gt,
            "gt_num_relations": len(gt),
        }
        p = tmp_path / f"g{g}.json"
        p.write_text(json.dumps(graph))
        paths.append(str(p))
    return paths


def test_input_gnn_train_batches(tmp_path):
    paths = _write_graph_jsons(tmp_path)
    inp = InputGNN({"sample_num_relations_to_consider": 20}, seed=0)
    batches = list(inp.train_batches(paths, batch_size=2, steps=3))
    assert len(batches) == 3
    b = batches[0]
    assert b["node_features"].shape[0] == 2
    assert b["relations_to_consider"].shape[2] == 2
    assert (b["num_relations_to_consider"] > 0).all()


def test_input_gnn_eval_batches_full_grid(tmp_path):
    paths = _write_graph_jsons(tmp_path, n_graphs=2)
    inp = InputGNN()
    out = list(inp.eval_batches(paths))
    assert len(out) == 2
    batch, path, graph = out[0]
    assert int(batch["num_relations_to_consider"][0]) == 25  # 5*5


def test_input_feature_mask_applied(tmp_path):
    paths = _write_graph_jsons(tmp_path, n_graphs=1)
    mask = [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1]
    inp = InputGNN({"node_input_feature_mask": mask})
    batch, _, _ = next(iter(inp.eval_batches(paths)))
    assert batch["node_features"].shape[-1] == 7


# ---------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.ones((3, 3), np.float32)},
             "count": np.int32(5)}
    save_checkpoint(str(tmp_path), 0, state)
    save_checkpoint(str(tmp_path), 1, state)
    save_checkpoint(str(tmp_path), 2, state)  # prunes step 0
    assert not os.path.exists(tmp_path / "0")
    template = {"params": {"w": np.zeros((3, 3), np.float32)},
                "count": np.int32(0)}
    restored, step = restore_checkpoint(str(tmp_path), template)
    assert step == 2
    assert (restored["params"]["w"] == 1).all()


def test_best_export_and_epoch_info(tmp_path):
    state = {"w": np.full((2,), 7.0, np.float32)}
    export_best(str(tmp_path), "f1", state)
    restored = restore_best(str(tmp_path), "f1", {"w": np.zeros((2,), np.float32)})
    assert (restored["w"] == 7.0).all()
    write_epoch_info(str(tmp_path), 5)
    assert read_epoch_info(str(tmp_path))["current_epoch"] == 5


def test_is_better_direction():
    from citlab_as_tpu.train.checkpoint import is_better
    assert is_better("f1", 0.5, None)
    assert is_better("f1", 0.9, 0.5)
    assert not is_better("f1", 0.4, 0.5)
    # loss improves DOWNWARD
    assert is_better("loss", 0.1, 0.5)
    assert not is_better("loss", 0.9, 0.5)
    assert is_better("eval_loss", 0.1, 0.5)


def test_ema_update():
    ema = {"w": np.zeros(2)}
    params = {"w": np.ones(2)}
    out = ema_update(ema, params, decay=0.9)
    assert np.allclose(out["w"], 0.1)


def test_warmstart_with_rename(tmp_path):
    src_state = {"old_scope": {"w": np.full((2, 2), 3.0, np.float32)}}
    save_checkpoint(str(tmp_path), 0, src_state)
    fresh = {"new_scope": {"w": np.zeros((2, 2), np.float32)},
             "other": {"b": np.zeros((4,), np.float32)}}
    template = {"old_scope": {"w": np.zeros((2, 2), np.float32)}}
    out = warmstart_params(fresh, str(tmp_path), template,
                           rename_map={r"^old_scope": "new_scope"})
    assert (out["new_scope"]["w"] == 3.0).all()
    assert (out["other"]["b"] == 0.0).all()  # untouched


# ---------------------------------------------------------------- trainer
def test_trainer_end_to_end(tmp_path):
    (tmp_path / "data").mkdir(exist_ok=True)
    graphs = _write_graph_jsons(tmp_path / "data", n_graphs=6)
    model_dir = str(tmp_path / "model")
    trainer = TrainerGNN(
        model_dir, graphs[:4], graphs[4:],
        flags={"epochs": 2, "samples_per_epoch": 8, "batch_size": 2,
               "eval_every_n": 1, "best_export_metrics": ["f1"],
               "num_classes": 2},
        input_params={"sample_num_relations_to_consider": 16,
                      "node_buckets": [8], "edge_buckets": [32]},
        seed=0)
    result = trainer.train()
    assert len(result["history"]) == 2
    assert "f1" in result["best_metrics"]
    assert os.path.exists(os.path.join(model_dir, "best", "f1"))
    info = read_epoch_info(model_dir)
    assert info["current_epoch"] == 2
    # best-so-far is persisted for resume (a resumed run must not clobber
    # best/f1 with a worse post-resume eval)
    assert info["best_metrics"]["f1"] == result["best_metrics"]["f1"]

    # resume: third epoch continues from info file, best carries over
    trainer2 = TrainerGNN(
        model_dir, graphs[:4], graphs[4:],
        flags={"epochs": 3, "samples_per_epoch": 8, "batch_size": 2,
               "eval_every_n": 1, "num_classes": 2},
        input_params={"sample_num_relations_to_consider": 16,
                      "node_buckets": [8], "edge_buckets": [32]},
        seed=0)
    result2 = trainer2.train()
    assert result2["history"][0]["epoch"] == 2
    assert result2["best_metrics"]["f1"] >= result["best_metrics"]["f1"]


def test_lav_relation(tmp_path):
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.gnn.model import GraphRelation
    graphs = _write_graph_jsons(tmp_path, n_graphs=2)
    model = GraphRelation(num_classes=2)
    inp = InputGNN()
    batch_np, _, _ = next(iter(inp.eval_batches(graphs)))
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch_np.items()})
    out = lav_relation(model, variables, graphs, num_p_r_thresholds=10)
    assert len(out["thresholds"]) == 10
    assert 0 <= out["accuracy"] <= 1
    assert "best_f1" in out


def test_input_gnn_visual_batches(tmp_path):
    """image_input: batches carry image/image_shape/visual regions padded to
    the buckets (input_dataset.py:116-128 contract)."""
    import json as json_mod
    from PIL import Image
    from citlab_as_tpu.train.input_pipeline import InputGNN

    rng = np.random.RandomState(0)
    n = 3
    regions = [[[20 + 50 * i, 60 + 50 * i, 60 + 50 * i, 20 + 50 * i],
                [20, 20, 100, 100]] for i in range(n)]
    graph = {
        "num_nodes": n,
        "interacting_nodes": [[0, 1], [1, 2]],
        "num_interacting_nodes": 2,
        "node_features": rng.rand(n, 15).tolist(),
        "edge_features": rng.rand(2, 2).tolist(),
        "visual_regions_nodes": regions,
        "num_points_visual_regions_nodes": [4] * n,
        "gt_relations": [[1, 0, 1], [1, 1, 0]],
        "gt_num_relations": 2,
    }
    (tmp_path / "json").mkdir()
    jp = tmp_path / "json" / "g.json"
    jp.write_text(json_mod.dumps(graph))
    Image.fromarray(np.full((200, 240), 255, np.uint8)).save(tmp_path / "g.png")

    inp = InputGNN({"image_input": True, "resize_min_dim": 64,
                    "resize_max_dim": 96, "node_buckets": [8],
                    "sample_num_relations_to_consider": 16}, seed=0)
    batch = next(iter(inp.train_batches([str(jp)], batch_size=2, steps=1)))
    assert batch["image"].shape == (2, 96, 96, 1)
    assert batch["image_shape"].shape == (2, 2)
    assert batch["visual_regions_nodes"].shape == (2, 8, 2, 16)
    assert batch["num_points_visual_regions_nodes"].shape == (2, 8)
    # regions scaled into the resized frame
    th, tw = batch["image_shape"][0]
    assert batch["visual_regions_nodes"].max() <= max(th, tw)

    # the visual GraphRelation trains on these batches
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.gnn.loss import relation_loss
    from citlab_as_tpu.models.gnn.model import GraphRelation

    model = GraphRelation(num_classes=2, image_input=True,
                          visual_backbone="ARU_v1")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jb)
    logits = model.apply(variables, jb, train=True)
    loss = relation_loss(logits, jb["relations_to_consider_gt"],
                         jb["num_relations_to_consider"])
    assert np.isfinite(float(loss))


def test_stale_info_does_not_suppress_best_export(tmp_path):
    """A model_dir holding a leftover current_epoch.info (with a high
    best_metrics) but NO numeric checkpoints is a fresh run: the phantom
    best must not suppress best/<metric> exports."""
    import json
    (tmp_path / "data").mkdir(exist_ok=True)
    graphs = _write_graph_jsons(tmp_path / "data", n_graphs=6)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    with open(model_dir / "current_epoch.info", "w") as f:
        json.dump({"current_epoch": 40, "best_metrics": {"f1": 0.999}}, f)
    trainer = TrainerGNN(
        str(model_dir), graphs[:4], graphs[4:],
        flags={"epochs": 1, "samples_per_epoch": 8, "batch_size": 2,
               "eval_every_n": 1, "best_export_metrics": ["f1"],
               "num_classes": 2},
        input_params={"sample_num_relations_to_consider": 16,
                      "node_buckets": [8], "edge_buckets": [32]},
        seed=0)
    result = trainer.train()
    assert result["history"][0]["epoch"] == 0          # fresh, not resumed
    assert "f1" in result["best_metrics"]              # export happened
    assert os.path.exists(os.path.join(str(model_dir), "best", "f1"))
