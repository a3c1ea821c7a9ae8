"""Backbone dispatcher (reference: article_separation/backbones/backbones.py:9-39).

Maps backbone names to constructors. ``ARU_v1`` / ``RU_v2`` / ``U`` share one
implementation parameterized by graph type; ``ARU_cutted_v1`` is the
down-path-only feature extractor (ARU_cutted_v1.py:7-73) used as the GNN
visual branch — no attention pyramid, no up path, no logits head.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from citlab_as_tpu.models.arunet import ARUCutted, ARUNet, DEFAULT_GRAPH_PARAMS

_BACKBONES = {
    "ARU_v1": {"graph": "ARU"},
    "RU_v2": {"graph": "RU"},
    "U_v1": {"graph": "U"},
}


def get_backbone(name: str, n_classes: int = 2,
                 graph_params: Optional[Dict[str, Any]] = None,
                 dtype=None):
    if name == "ARU_cutted_v1":
        kwargs = {"graph_params": dict(graph_params) if graph_params else None}
        if dtype is not None:
            kwargs["dtype"] = dtype
        return ARUCutted(**kwargs)
    if name not in _BACKBONES:
        raise ValueError(
            f"Unknown backbone '{name}'. Available: "
            f"{sorted(_BACKBONES) + ['ARU_cutted_v1']}")
    gp = dict(DEFAULT_GRAPH_PARAMS)
    gp.update(_BACKBONES[name])
    if graph_params:
        gp.update(graph_params)
    kwargs = {"n_classes": n_classes, "graph_params": gp}
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ARUNet(**kwargs)
