"""ARU-Net segmentation trainer — reproduces the separator/heading nets.

The reference trained these nets through the same tf.estimator loop as the
GNN (trainer_base.py); this trainer mirrors TrainerGNN's epoch structure
(eval-every-n, best export, early stopping, resume) over the segmentation
train step, with batches sharded over the mesh's data axis.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.models.arunet import ARUNet
from citlab_as_tpu.train import checkpoint as ckpt
from citlab_as_tpu.train.optimizer import build_optimizer
from citlab_as_tpu.train.seg_input_pipeline import SegmentationDataset, find_gt_examples
from citlab_as_tpu.train.segmentation import make_train_step, make_eval_step

logger = logging.getLogger(__name__)

DEFAULT_SEG_FLAGS: Dict[str, Any] = {
    "epochs": 100,
    "steps_per_epoch": 256,
    "batch_size": 4,
    "crop_size": (512, 512),
    "eval_every_n": 1,
    "eval_steps": 16,
    "early_stopping_patience": 0,
    "best_export_metrics": ["accuracy"],
    "n_classes": 2,
    "ema_decay": 0.0,
    "schedule_kind": "final_decay",
}


class TrainerSegmentation:
    def __init__(self, model_dir: str, train_gt_dir: str,
                 eval_gt_dir: Optional[str] = None,
                 flags: Optional[Dict[str, Any]] = None,
                 graph_params: Optional[dict] = None,
                 optimizer_params: Optional[dict] = None,
                 seed: int = 0):
        self.flags = dict(DEFAULT_SEG_FLAGS)
        if flags:
            self.flags.update(flags)
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)

        train_examples = find_gt_examples(train_gt_dir)
        if not train_examples:
            raise ValueError(f"No GT examples in {train_gt_dir}")
        self.train_ds = SegmentationDataset(
            train_examples, crop_size=tuple(self.flags["crop_size"]), seed=seed)
        self.eval_ds = None
        if eval_gt_dir:
            eval_examples = find_gt_examples(eval_gt_dir)
            if eval_examples:
                self.eval_ds = SegmentationDataset(
                    eval_examples, crop_size=tuple(self.flags["crop_size"]),
                    augment=False, seed=seed + 1)

        self.model = ARUNet(n_classes=self.flags["n_classes"],
                            graph_params=graph_params, dtype=jnp.bfloat16)
        self.optimizer = build_optimizer(
            optimizer_params, self.flags["steps_per_epoch"],
            self.flags["epochs"], self.flags["schedule_kind"])
        self.seed = seed

    def train(self) -> Dict[str, Any]:
        ch, cw = self.flags["crop_size"]
        rng = jax.random.PRNGKey(self.seed)
        params = self.model.init(rng, jnp.zeros((1, ch, cw, 1), jnp.float32))
        opt_state = self.optimizer.init(params)
        state = {"params": params, "opt_state": opt_state}
        if self.flags["ema_decay"] > 0:
            state["ema"] = ckpt.ema_init(params)

        info = ckpt.read_epoch_info(self.model_dir)
        start_epoch = 0
        resumed = False
        if info:
            state, restored = ckpt.restore_checkpoint(self.model_dir, state)
            if restored is not None:
                start_epoch = info["current_epoch"]
                resumed = True
                logger.info("Resuming segmentation training from epoch %d", start_epoch)

        base_step = make_train_step(self.model, self.optimizer)
        ema_decay = self.flags["ema_decay"]

        @jax.jit
        def train_step(state, batch):
            params, opt_state, loss = base_step(
                state["params"], state["opt_state"], batch)
            new_state = {"params": params, "opt_state": opt_state}
            if "ema" in state:
                new_state["ema"] = ckpt.ema_update(state["ema"], params, ema_decay)
            return new_state, loss

        eval_step = jax.jit(make_eval_step(self.model))

        history: List[dict] = []
        # best-so-far survives resume (current_epoch.info extra), matching
        # trainer.TrainerGNN — a resumed run must not clobber
        # best/<metric> with a worse post-resume eval; seeded only when the
        # checkpoint actually restored (stale info without checkpoints must
        # not suppress a fresh run's exports)
        best: Dict[str, float] = dict(
            info.get("best_metrics", {})) if resumed else {}
        bad_evals = 0
        for epoch in range(start_epoch, self.flags["epochs"]):
            t0 = time.time()
            losses = []
            for batch_np in self.train_ds.batches(
                    self.flags["batch_size"], self.flags["steps_per_epoch"]):
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                state, loss = train_step(state, batch)
                losses.append(float(loss))
            record = {"epoch": epoch, "loss": float(np.mean(losses))}
            logger.info("seg epoch %d: loss=%.4f (%.1fs)", epoch,
                        record["loss"], time.time() - t0)

            if self.eval_ds and (epoch + 1) % self.flags["eval_every_n"] == 0:
                eval_params = state.get("ema", state["params"]) \
                    if ema_decay > 0 else state["params"]
                metrics = {"loss": [], "accuracy": []}
                for batch_np in self.eval_ds.batches(
                        self.flags["batch_size"], self.flags["eval_steps"]):
                    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                    out = eval_step(eval_params, batch)
                    for k in metrics:
                        metrics[k].append(float(out[k]))
                metrics = {k: float(np.mean(v)) for k, v in metrics.items()}
                record.update(metrics)
                improved = False
                for metric in self.flags["best_export_metrics"]:
                    if metric in metrics and ckpt.is_better(
                            metric, metrics[metric], best.get(metric)):
                        best[metric] = metrics[metric]
                        ckpt.export_best(self.model_dir, metric, eval_params)
                        improved = True
                if self.flags["early_stopping_patience"] > 0:
                    bad_evals = 0 if improved else bad_evals + 1
                    if bad_evals >= self.flags["early_stopping_patience"]:
                        history.append(record)
                        break
            history.append(record)
            ckpt.save_checkpoint(self.model_dir, epoch, state)
            ckpt.write_epoch_info(self.model_dir, epoch + 1,
                                  extra={"best_metrics": best})
        return {"state": state, "best_metrics": best, "history": history}
