"""Relation loss + metrics (reference: gnn/model/model_relation.py:18-256).

Masked sparse softmax cross-entropy over sampled relations, optional L2
weight decay over non-bias params; threshold metrics (accuracy, precision,
recall, F1) and AUC summaries are computed host-side from confidences.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax


def relation_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                  num_relations: jnp.ndarray,
                  params=None, weight_decay: float = 0.0) -> jnp.ndarray:
    """Mean masked CE (+ L2 over non-bias weights when weight_decay > 0)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    mask = (jnp.arange(logits.shape[1])[None, :] < num_relations[:, None]).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(ce * mask) / total
    if weight_decay > 0.0 and params is not None:
        l2 = 0.0
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = "/".join(str(p) for p in path)
            if "bias" not in name:
                l2 = l2 + 0.5 * jnp.sum(leaf.astype(jnp.float32) ** 2)
        loss = loss + weight_decay * l2
    return loss


def relation_metrics(confidences: np.ndarray, targets: np.ndarray,
                     num_relations: np.ndarray, threshold: float = 0.5
                     ) -> Dict[str, float]:
    """Host-side ACC/P/R/F1 (+ AUC-PR/ROC via sklearn if available) over the
    valid relations."""
    mask = np.arange(confidences.shape[1])[None, :] < np.asarray(num_relations)[:, None]
    conf = np.asarray(confidences)[mask]
    gt = np.asarray(targets)[mask]
    pred = (conf >= threshold).astype(np.int32)

    tp = float(np.sum((pred == 1) & (gt == 1)))
    fp = float(np.sum((pred == 1) & (gt == 0)))
    fn = float(np.sum((pred == 0) & (gt == 1)))
    tn = float(np.sum((pred == 0) & (gt == 0)))
    acc = (tp + tn) / max(tp + tn + fp + fn, 1.0)
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    out = {"accuracy": acc, "precision": precision, "recall": recall, "f1": f1}

    try:
        from sklearn.metrics import average_precision_score, roc_auc_score
        if len(set(gt.tolist())) > 1:
            out["auc_pr"] = float(average_precision_score(gt, conf))
            out["auc_roc"] = float(roc_auc_score(gt, conf))
    except ImportError:
        pass
    return out


def relation_curves(confidences: np.ndarray, targets: np.ndarray,
                    num_relations: np.ndarray, num_thresholds: int = 201
                    ) -> Dict[str, list]:
    """Streaming PR + ROC curve points over the valid relations
    (misc.py:550-638 semantics: tp/fp/tn/fn accumulated per evenly spaced
    threshold bucket; here one histogram pass + cumulative sums).

    Returns {thresholds, precision, recall, fpr, tpr} lists suitable for a
    JSON dump per eval epoch."""
    mask = np.arange(confidences.shape[1])[None, :] < \
        np.asarray(num_relations)[:, None]
    conf = np.clip(np.asarray(confidences)[mask], 0.0, 1.0)
    gt = np.asarray(targets)[mask]

    edges = np.linspace(0.0, 1.0, num_thresholds)
    pos_hist, _ = np.histogram(conf[gt == 1], bins=num_thresholds - 1,
                               range=(0.0, 1.0))
    neg_hist, _ = np.histogram(conf[gt == 0], bins=num_thresholds - 1,
                               range=(0.0, 1.0))
    total_pos = float(pos_hist.sum())
    total_neg = float(neg_hist.sum())
    # tp(threshold t) = #positives with conf >= t  (suffix sums)
    tp = np.concatenate([np.cumsum(pos_hist[::-1])[::-1], [0.0]])
    fp = np.concatenate([np.cumsum(neg_hist[::-1])[::-1], [0.0]])
    fn = total_pos - tp
    tn = total_neg - fp
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / np.maximum(tp + fn, 1e-12)
    fpr = fp / np.maximum(fp + tn, 1e-12)
    tpr = recall
    return {"thresholds": edges.tolist(),
            "precision": precision.tolist(),
            "recall": recall.tolist(),
            "fpr": fpr.tolist(),
            "tpr": tpr.tolist(),
            "num_positive": total_pos,
            "num_negative": total_neg}
