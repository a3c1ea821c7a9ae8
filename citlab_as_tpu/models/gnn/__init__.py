from citlab_as_tpu.models.gnn.graph import (
    correct_edges, sample_relations, build_full_relations, fully_connected_edges,
)
from citlab_as_tpu.models.gnn.model import GraphRelation, GraphGNN
from citlab_as_tpu.models.gnn.loss import relation_loss, relation_metrics

__all__ = [
    "correct_edges", "sample_relations", "build_full_relations",
    "fully_connected_edges", "GraphRelation", "GraphGNN",
    "relation_loss", "relation_metrics",
]
