"""LAV — load-and-validate the exported relation model.

Reference: gnn/trainer/lav_rel.py:64+ — run the exported model over an eval
list and report a precision/recall curve over ``num_p_r_thresholds``
equidistant thresholds plus ROC-AUC and accuracy.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.models.gnn.model import GraphRelation
from citlab_as_tpu.train.input_pipeline import InputGNN


def lav_relation(model: GraphRelation, variables, eval_list: Sequence[str],
                 input_params: Optional[dict] = None,
                 num_p_r_thresholds: int = 20) -> Dict[str, object]:
    """Returns {'thresholds', 'precisions', 'recalls', 'f1s', 'accuracy',
    'auc_roc', 'auc_pr', 'best_f1', 'best_threshold'}."""
    input_fn = InputGNN(input_params)
    predict = jax.jit(lambda v, b: jax.nn.softmax(
        model.apply(v, b), axis=-1)[..., 1])

    confs: List[np.ndarray] = []
    gts: List[np.ndarray] = []
    for batch_np, _, _ in input_fn.eval_batches(eval_list):
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        conf = np.asarray(predict(variables, batch))[0]
        num = int(batch_np["num_relations_to_consider"][0])
        confs.append(conf[:num])
        gts.append(batch_np["relations_to_consider_gt"][0][:num])
    if not confs:
        return {}
    conf = np.concatenate(confs)
    gt = np.concatenate(gts)

    thresholds = np.linspace(0.0, 1.0, num_p_r_thresholds + 1, endpoint=False)[1:]
    precisions, recalls, f1s = [], [], []
    for t in thresholds:
        pred = conf >= t
        tp = float(np.sum(pred & (gt == 1)))
        fp = float(np.sum(pred & (gt == 0)))
        fn = float(np.sum(~pred & (gt == 1)))
        p = tp / max(tp + fp, 1.0)
        r = tp / max(tp + fn, 1.0)
        precisions.append(p)
        recalls.append(r)
        f1s.append(2 * p * r / max(p + r, 1e-12))

    out: Dict[str, object] = {
        "thresholds": thresholds.tolist(),
        "precisions": precisions,
        "recalls": recalls,
        "f1s": f1s,
        "accuracy": float(np.mean((conf >= 0.5) == (gt == 1))),
        "best_f1": float(np.max(f1s)),
        "best_threshold": float(thresholds[int(np.argmax(f1s))]),
    }
    try:
        from sklearn.metrics import average_precision_score, roc_auc_score
        if len(set(gt.tolist())) > 1:
            out["auc_roc"] = float(roc_auc_score(gt, conf))
            out["auc_pr"] = float(average_precision_score(gt, conf))
    except ImportError:
        pass
    return out
