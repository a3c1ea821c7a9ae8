"""Relation-GNN trainer: the tf.estimator epoch loop, TPU-native.

Reference: gnn/trainer/trainer_base.py:93-264 + trainer_rel.py:13-69.
Epoch loop: train steps_per_epoch batches, evaluate every
``eval_every_n`` epochs on the full relation grid, export the best state per
metric, early-stop after ``early_stopping_patience`` non-improving evals,
resume from current_epoch.info. The train step is one jitted function;
batches are sharded over the mesh's data axis (XLA inserts the gradient
all-reduce); optional EMA shadow weights are exported alongside.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from citlab_as_tpu.models.gnn.loss import relation_loss, relation_metrics
from citlab_as_tpu.models.gnn.model import GraphRelation
from citlab_as_tpu.train import checkpoint as ckpt
from citlab_as_tpu.train.input_pipeline import InputGNN
from citlab_as_tpu.train.optimizer import build_optimizer

logger = logging.getLogger(__name__)

DEFAULT_TRAINER_FLAGS: Dict[str, Any] = {
    "epochs": 200,
    "samples_per_epoch": 8192,
    "batch_size": 16,
    "eval_every_n": 1,
    "early_stopping_patience": 0,      # 0 = disabled
    "best_export_metrics": ["f1"],
    "weight_decay": 0.0,
    "ema_decay": 0.0,                  # 0 = disabled
    "schedule_kind": "final_decay",
    "grad_accum_steps": 1,
    "num_classes": 2,
    "export_curves": False,            # dump PR/ROC curve JSONs per eval
}


class TrainerGNN:
    """Train the GraphRelation model over graph-feature JSON lists."""

    def __init__(self, model_dir: str, train_list: Sequence[str],
                 eval_list: Sequence[str],
                 flags: Optional[Dict[str, Any]] = None,
                 input_params: Optional[dict] = None,
                 optimizer_params: Optional[dict] = None,
                 model: Optional[GraphRelation] = None,
                 seed: int = 0):
        self.flags = dict(DEFAULT_TRAINER_FLAGS)
        if flags:
            self.flags.update(flags)
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self.train_list = list(train_list)
        self.eval_list = list(eval_list)
        self.input_fn = InputGNN(input_params,
                                 num_classes=self.flags["num_classes"],
                                 seed=seed)
        self.model = model or GraphRelation(num_classes=self.flags["num_classes"])
        self.steps_per_epoch = max(
            1, self.flags["samples_per_epoch"] // self.flags["batch_size"])
        self.optimizer = build_optimizer(
            optimizer_params, self.steps_per_epoch, self.flags["epochs"],
            self.flags["schedule_kind"], self.flags["grad_accum_steps"])
        self.seed = seed
        self._train_step = None
        self.history: List[Dict[str, float]] = []

    # ------------------------------------------------------------------
    def _init_state(self, example_batch):
        variables = self.model.init(
            jax.random.PRNGKey(self.seed),
            {k: jnp.asarray(v) for k, v in example_batch.items()})
        opt_state = self.optimizer.init(variables)
        state = {"params": variables, "opt_state": opt_state}
        if self.flags["ema_decay"] > 0:
            state["ema"] = ckpt.ema_init(variables)
        return state

    def _make_train_step(self):
        weight_decay = self.flags["weight_decay"]
        ema_decay = self.flags["ema_decay"]
        model = self.model
        optimizer = self.optimizer

        def train_step(state, batch):
            def loss_fn(variables):
                logits = model.apply(variables, batch, train=True)
                return relation_loss(
                    logits, batch["relations_to_consider_gt"],
                    batch["num_relations_to_consider"],
                    params=variables.get("params"), weight_decay=weight_decay)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": opt_state}
            if "ema" in state:
                new_state["ema"] = ckpt.ema_update(state["ema"], params, ema_decay)
            return new_state, loss

        return jax.jit(train_step)

    # ------------------------------------------------------------------
    def evaluate(self, variables, curves_path: str = None) -> Dict[str, float]:
        """Full-grid evaluation over the eval list (model_relation metrics).
        With ``curves_path``, additionally dumps streaming PR/ROC curve
        points (misc.py:550-638 observability parity) as JSON."""
        confs_all, gts_all, nums_all = [], [], []
        predict = jax.jit(lambda v, b: jax.nn.softmax(
            self.model.apply(v, b), axis=-1)[..., 1])
        for batch_np, _, _ in self.input_fn.eval_batches(self.eval_list):
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            conf = np.asarray(predict(variables, batch))
            confs_all.append(conf)
            gts_all.append(batch_np["relations_to_consider_gt"])
            nums_all.append(batch_np["num_relations_to_consider"])
        if not confs_all:
            return {}
        max_r = max(c.shape[1] for c in confs_all)

        def padcat(arrs):
            return np.concatenate([
                np.pad(a, ((0, 0), (0, max_r - a.shape[1]))) for a in arrs])

        conf, gt, num = (padcat(confs_all), padcat(gts_all),
                         np.concatenate(nums_all))
        if curves_path:
            import json
            from citlab_as_tpu.models.gnn.loss import relation_curves
            os.makedirs(os.path.dirname(curves_path), exist_ok=True)
            with open(curves_path, "w") as f:
                json.dump(relation_curves(conf, gt, num), f)
        return relation_metrics(conf, gt, num)

    # ------------------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        batches = self.input_fn.train_batches(
            self.train_list, self.flags["batch_size"], self.steps_per_epoch)
        first_batch = next(iter(batches))
        state = self._init_state(first_batch)

        # resume
        info = ckpt.read_epoch_info(self.model_dir)
        start_epoch = 0
        resumed = False
        if info:
            state, restored = ckpt.restore_checkpoint(self.model_dir, state)
            if restored is not None:
                start_epoch = info["current_epoch"]
                resumed = True
                logger.info("Resuming from epoch %d", start_epoch)

        train_step = self._make_train_step()
        # best-so-far survives resume via current_epoch.info (a resumed run
        # must not clobber best/<metric> with a worse post-resume eval;
        # trainer_base.py:254-264 persists only the epoch, but its
        # best-export comparison reads the previously-saved eval events —
        # the info file is the rebuild's equivalent record). Seeded ONLY
        # when the checkpoint actually restored: a fresh run into a dir
        # holding a stale info file (numeric checkpoints pruned, best/
        # export kept) must not inherit a phantom best that suppresses
        # every export.
        best_metrics: Dict[str, float] = dict(
            info.get("best_metrics", {})) if resumed else {}
        bad_evals = 0

        for epoch in range(start_epoch, self.flags["epochs"]):
            t0 = time.time()
            losses = []
            batch_iter = self.input_fn.train_batches(
                self.train_list, self.flags["batch_size"], self.steps_per_epoch)
            for batch_np in batch_iter:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                state, loss = train_step(state, batch)
                losses.append(float(loss))
            epoch_loss = float(np.mean(losses))
            logger.info("epoch %d: loss=%.4f (%.1fs)",
                        epoch, epoch_loss, time.time() - t0)

            record = {"epoch": epoch, "loss": epoch_loss}
            if (epoch + 1) % self.flags["eval_every_n"] == 0 and self.eval_list:
                eval_params = state.get("ema", state["params"]) \
                    if self.flags["ema_decay"] > 0 else state["params"]
                curves_path = (os.path.join(
                    self.model_dir, "curves", f"epoch_{epoch:04d}.json")
                    if self.flags.get("export_curves") else None)
                metrics = self.evaluate(eval_params, curves_path=curves_path)
                record.update(metrics)
                logger.info("epoch %d eval: %s", epoch, metrics)

                improved = False
                for metric in self.flags["best_export_metrics"]:
                    if metric in metrics and ckpt.is_better(
                            metric, metrics[metric], best_metrics.get(metric)):
                        best_metrics[metric] = metrics[metric]
                        ckpt.export_best(self.model_dir, metric, eval_params)
                        improved = True
                if self.flags["early_stopping_patience"] > 0:
                    bad_evals = 0 if improved else bad_evals + 1
                    if bad_evals >= self.flags["early_stopping_patience"]:
                        logger.info("Early stopping at epoch %d", epoch)
                        self.history.append(record)
                        break
            self.history.append(record)
            ckpt.save_checkpoint(self.model_dir, epoch, state)
            ckpt.write_epoch_info(self.model_dir, epoch + 1,
                                  extra={"best_metrics": best_metrics})

        return {"state": state, "best_metrics": best_metrics,
                "history": self.history}
