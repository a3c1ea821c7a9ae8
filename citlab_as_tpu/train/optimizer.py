"""Optimizers + epoch-based LR schedules.

Reference: gnn/model/graph_util/optimizer.py:9-171. Schedules operate on the
epoch index (global_step // steps_per_epoch):

- decay: lr * decay_rate ^ floor(epoch / learning_circle) (staircase)
- final_decay: + cosine cooldown to decay_fraction over the final_epochs
- warmup_final_decay: + linear warmup from lr/warmup_factor over warmup_epochs

Implemented as optax schedules (pure functions of the step).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import optax

DEFAULT_OPTIMIZER_PARAMS: Dict[str, Any] = {
    "optimizer": "adam",
    "learning_rate": 0.001,
    "lr_decay_rate": 0.99,
    "learning_circle": 3,
    # final decay
    "final_epochs": 50,
    "decay_fraction": 0.1,
    # warmup
    "warmup_epochs": 10,
    "warmup_factor": 10,
}


def decay_schedule(learning_rate: float, steps_per_epoch: int,
                   learning_circle: int, lr_decay_rate: float):
    """Staircase exponential decay per learning_circle epochs."""
    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        return learning_rate * lr_decay_rate ** jnp.floor(epoch / learning_circle)
    return schedule


def final_decay_schedule(learning_rate: float, steps_per_epoch: int,
                         learning_circle: int, lr_decay_rate: float,
                         decay_fraction: float, epochs: int, final_epochs: int,
                         delay: int = 0):
    """Staircase decay with cosine cooldown over the final epochs
    (optimizer.py:107-135)."""
    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        completed = (epoch - delay) / learning_circle
        lam = jnp.where(
            epoch <= delay, learning_rate,
            learning_rate * lr_decay_rate ** jnp.floor(completed))
        cooled = lam * (decay_fraction + (1 - decay_fraction) * (
            0.5 + 0.5 * jnp.cos(
                (epoch - epochs + final_epochs) / final_epochs * math.pi)))
        return jnp.where(epoch <= epochs - final_epochs, lam, cooled)
    return schedule


def warmup_final_decay_schedule(learning_rate: float, steps_per_epoch: int,
                                learning_circle: int, lr_decay_rate: float,
                                decay_fraction: float, epochs: int,
                                final_epochs: int, warmup_epochs: int,
                                warmup_factor: float):
    """Linear warmup from lr/warmup_factor, then final-decay
    (optimizer.py:138-171)."""
    base = final_decay_schedule(
        learning_rate, steps_per_epoch, learning_circle, lr_decay_rate,
        decay_fraction, epochs, final_epochs, delay=warmup_epochs)

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        start = learning_rate / warmup_factor
        warm = start + (learning_rate - start) / warmup_epochs * epoch
        # during warmup the base schedule holds lr constant (epoch <= delay),
        # so scale its output by warm/learning_rate
        return jnp.where(epoch < warmup_epochs,
                         base(step) * warm / learning_rate, base(step))
    return schedule


def build_schedule(kind: str, params: Dict[str, Any], steps_per_epoch: int,
                   epochs: int):
    """kind in ('decay', 'final_decay', 'warmup_final_decay')."""
    p = dict(DEFAULT_OPTIMIZER_PARAMS)
    p.update(params or {})
    if kind == "decay":
        return decay_schedule(p["learning_rate"], steps_per_epoch,
                              p["learning_circle"], p["lr_decay_rate"])
    if kind == "final_decay":
        return final_decay_schedule(
            p["learning_rate"], steps_per_epoch, p["learning_circle"],
            p["lr_decay_rate"], p["decay_fraction"], epochs, p["final_epochs"])
    if kind == "warmup_final_decay":
        return warmup_final_decay_schedule(
            p["learning_rate"], steps_per_epoch, p["learning_circle"],
            p["lr_decay_rate"], p["decay_fraction"], epochs, p["final_epochs"],
            p["warmup_epochs"], p["warmup_factor"])
    raise ValueError(f"Unknown schedule kind '{kind}'")


def build_optimizer(params: Optional[Dict[str, Any]] = None,
                    steps_per_epoch: int = 1, epochs: int = 200,
                    schedule_kind: str = "final_decay",
                    grad_accum_steps: int = 1) -> optax.GradientTransformation:
    """Optimizer factory: adam | nadam | rmsprop | sgd with an epoch schedule;
    optional gradient accumulation (model_base.py:344-388 analog) via
    optax.MultiSteps."""
    p = dict(DEFAULT_OPTIMIZER_PARAMS)
    p.update(params or {})
    schedule = build_schedule(schedule_kind, p, steps_per_epoch, epochs)
    name = p["optimizer"]
    if name == "adam":
        opt = optax.adam(schedule)
    elif name == "nadam":
        opt = optax.nadam(schedule) if hasattr(optax, "nadam") else optax.adam(schedule)
    elif name == "rmsprop":
        opt = optax.rmsprop(schedule)
    elif name == "sgd":
        opt = optax.sgd(schedule)
    else:
        raise ValueError(f"Unknown optimizer '{name}'")
    if grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum_steps)
    return opt
