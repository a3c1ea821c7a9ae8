"""Checkpointing, EMA, best-model export, epoch resume, warmstart.

Reference analogs: tf.estimator checkpoints + ``current_epoch.info`` resume
(trainer_base.py:228-264), best-model copies per metric (export_best,
trainer_base.py:169-189, gnn/io.py:45-66), EMA shadow weights
(model_base.py:202-211), warm start with variable renames
(util/warmstart.py:8-97). TPU-native: orbax for the pytree state; exports
are orbax checkpoints under best/<metric>/.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


# ---------------------------------------------------------------- EMA

def ema_init(params):
    return jax.tree_util.tree_map(lambda x: x, params)


def ema_update(ema_params, params, decay: float = 0.999):
    """shadow = decay * shadow + (1 - decay) * params."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


# ---------------------------------------------------------------- orbax IO

def _checkpointer():
    # synchronous checkpointer: saves are committed before returning
    # (StandardCheckpointer is async and would leave .orbax-checkpoint-tmp
    # dirs behind in short-lived processes)
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


def _arrayify(tree):
    """orbax rejects bare numpy/python scalars — promote them to 0-d arrays."""
    def conv(x):
        if isinstance(x, (int, float, np.integer, np.floating)):
            return np.asarray(x)
        return x
    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(ckpt_dir: str, step: int, state) -> str:
    """Save pytree ``state`` under <ckpt_dir>/<step>."""
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, _arrayify(state))
    _prune_checkpoints(ckpt_dir, keep=2)
    return path


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore the given (or latest) step; returns (state, step) or
    (template, None) when no checkpoint exists."""
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
        if step is None:
            return state_template, None
    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    return _checkpointer().restore(path, _arrayify(state_template)), step


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def _prune_checkpoints(ckpt_dir: str, keep: int = 2) -> None:
    """keep_checkpoint_max=2 semantics (trainer_base.py:228-237)."""
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if re.fullmatch(r"\d+", d))
    for step in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, str(step)), ignore_errors=True)


# ---------------------------------------------------------------- best export

_LOWER_IS_BETTER = ("loss",)


def is_better(metric_name: str, new: float, best: Optional[float]) -> bool:
    """Direction-aware best-metric comparison: 'loss' improves downward,
    everything else (accuracy/precision/recall/f1/auc_*) upward
    (trainer_base.py:169-189 keys best exports off the eval events the same
    way)."""
    if best is None:
        return True
    if any(metric_name == m or metric_name.endswith("_" + m)
           for m in _LOWER_IS_BETTER):
        return new < best
    return new > best


def export_best(ckpt_dir: str, metric_name: str, state) -> str:
    """Copy the current state to best/<metric>/ (trainer_base.py:169-189)."""
    path = os.path.abspath(os.path.join(ckpt_dir, "best", metric_name))
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, _arrayify(state))
    return path


def restore_best(ckpt_dir: str, metric_name: str, state_template):
    path = os.path.abspath(os.path.join(ckpt_dir, "best", metric_name))
    return _checkpointer().restore(path, _arrayify(state_template))


# ---------------------------------------------------------------- epoch info

def write_epoch_info(model_dir: str, epoch: int, extra: Optional[Dict] = None) -> None:
    """current_epoch.info resume file (trainer_base.py:254-264)."""
    info = {"current_epoch": epoch}
    if extra:
        info.update(extra)
    with open(os.path.join(model_dir, "current_epoch.info"), "w") as f:
        json.dump(info, f)


def read_epoch_info(model_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(model_dir, "current_epoch.info")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------- warmstart

def warmstart_params(params, ckpt_dir: str, template,
                     rename_map: Optional[Dict[str, str]] = None,
                     include_pattern: Optional[str] = None):
    """Initialize matching leaves of ``params`` from a checkpoint, with
    optional regex renames applied to source paths (util/warmstart.py:8-97).
    Leaves missing from the source keep their fresh values."""
    source, _ = restore_checkpoint(ckpt_dir, template)

    def flatten(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(p))) for p in path)
            out[name] = leaf
        return out

    src_flat = flatten(source)
    if rename_map:
        renamed = {}
        for name, leaf in src_flat.items():
            new_name = name
            for pattern, repl in rename_map.items():
                new_name = re.sub(pattern, repl, new_name)
            renamed[new_name] = leaf
        src_flat = renamed

    include_re = re.compile(include_pattern) if include_pattern else None

    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    treedef = jax.tree_util.tree_structure(params)
    new_leaves = []
    for path, leaf in leaves_with_path:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        candidate = src_flat.get(name)
        usable = (
            candidate is not None
            and np.shape(candidate) == np.shape(leaf)
            and (include_re is None or include_re.search(name)))
        new_leaves.append(candidate if usable else leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
