"""Training step for the ARU-Net segmentation nets.

The reference trains these through tf.estimator with softmax cross-entropy
over per-pixel class maps. TPU-native: pure-functional optax train step,
jitted once; data parallel over the mesh by sharding the batch (the gradient
all-reduce is inserted by XLA).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from citlab_as_tpu.models.arunet import ARUNet


def create_model(n_classes: int = 2, graph_params: Optional[Dict[str, Any]] = None,
                 dtype=jnp.bfloat16) -> ARUNet:
    return ARUNet(n_classes=n_classes, graph_params=graph_params, dtype=dtype)


def init_params(model: ARUNet, rng, input_shape=(1, 256, 256, 1)):
    return model.init(rng, jnp.zeros(input_shape, jnp.float32))


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None,
                      class_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean per-pixel softmax CE; optional validity mask for padded pixels
    and per-class weights (rare-class boosting, e.g. thin separators)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    weights = jnp.ones_like(ce) if mask is None else mask
    if class_weights is not None:
        weights = weights * jnp.asarray(class_weights)[labels]
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def make_train_step(model: ARUNet, optimizer: optax.GradientTransformation):
    """Returns jittable ``train_step(params, opt_state, batch) ->
    (params, opt_state, loss)``; batch = {'image': [B,H,W,1] float,
    'label': [B,H,W] int, 'mask': [B,H,W] float or None}."""

    def loss_fn(params, batch):
        logits, _ = model.apply(params, batch["image"], train=True)
        return segmentation_loss(logits, batch["label"], batch.get("mask"))

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_eval_step(model: ARUNet):
    def eval_step(params, batch):
        logits, _ = model.apply(params, batch["image"])
        loss = segmentation_loss(logits, batch["label"], batch.get("mask"))
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((pred == batch["label"]).astype(jnp.float32))
        return {"loss": loss, "accuracy": acc}
    return eval_step
