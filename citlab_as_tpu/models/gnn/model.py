"""Relation-prediction GNN in JAX/flax (the net inside mixed_gnn_vn7e*.pb).

Architecture per the reference training code:
- GraphGNN (gnn/model/graph/graph_gnn.py:46-167): batch flattened into one
  union graph via ``b * max_nodes`` index offsets; optional node-feature
  compression; T=3 message+update transitions from zero h/c; output
  'hidden' | 'add_final_hidden_and_input' | 'concat_final_hidden_and_input'.
- Message function (message_fn_chunk.py:8-453): per-edge interaction feature
  = MLP over [u_from, u_to, u_diff, u_diff^2, edge_feat, h_from, h_to,
  h_diff, h_diff^2] -> tanh 32-d; neighbor weighting 1/in-degree (default)
  or MLP attention with per-destination softmax, multi-head concat/average;
  aggregation sum or max per destination node.
- Update function (update_fn_lstm.py:31-101): per-node LSTM built from four
  dense gates over concat [x, h, u], hidden 32-d.
- Classifier (graph_relation.py:229-287): gather the two nodes' features per
  relation, concat, MLP (64, 32) -> num_classes logits.

TPU-first: where the reference chunks edges through a tf.while_loop and
reduces each feature dim through a sparse map_fn, this uses ONE
``jax.ops.segment_sum/max`` over the flattened edge set — static shapes,
fully fused by XLA, no host sync. Edge dedup happens on host
(:mod:`citlab_as_tpu.models.gnn.graph`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

DEFAULT_GNN_PARAMS: Dict[str, Any] = {
    "num_transition_steps": 3,
    "compress_node_feature_dim": 0,
    "dropout_rate_node_features": 0.0,
    "output_type": "hidden",
}

DEFAULT_MESSAGE_PARAMS: Dict[str, Any] = {
    "aggregation_type": "sum",
    "interaction_feature_dim": 32,
    "num_hidden_units_interaction_fct": [32],
    "use_attention": False,
    "num_attention_heads": 1,
    "multihead_attention_merge_type": "concat",
    "num_hidden_units_attention_fct": [16],
}

DEFAULT_UPDATE_PARAMS: Dict[str, Any] = {
    "hidden_node_feature_dim": 32,
    "incorporate_hidden_features_in_update": True,
    "incorporate_node_input_features_in_update": True,
}


def _merge(defaults: Dict[str, Any], override: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    out = dict(defaults)
    if override:
        out.update(override)
    return out


class _MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    output_activation: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i, units in enumerate(self.hidden):
            x = nn.relu(nn.Dense(units, name=f"hidden_{i}")(x))
        x = nn.Dense(self.out_dim, name="out")(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


def _segment_softmax(values, segments, num_segments, mask):
    """Numerically-stable softmax of ``values`` grouped by ``segments``
    (per-destination attention normalization)."""
    values = jnp.where(mask, values, -jnp.inf)
    seg_max = jax.ops.segment_max(values, segments, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = jnp.where(mask, values - seg_max[segments], -jnp.inf)
    exp = jnp.where(mask, jnp.exp(shifted), 0.0)
    seg_sum = jax.ops.segment_sum(exp, segments, num_segments=num_segments)
    return exp / jnp.maximum(seg_sum[segments], 1e-12)


class MessageFn(nn.Module):
    """Segment-reduction message function (one attention head)."""
    params: Dict[str, Any]

    @nn.compact
    def __call__(self, u, h, edges, edge_feats, edge_mask, num_segments):
        # u: [M, Du] or None; h: [M, Dh]; edges: [Etot, 2] flat indices;
        # edge_feats: [Etot, De] or None; edge_mask: [Etot] bool
        p = self.params
        heads = p["num_attention_heads"] if p["use_attention"] else 1
        x_dim = p["interaction_feature_dim"]
        if p["use_attention"] and p["multihead_attention_merge_type"] == "concat":
            x_dim = x_dim // heads

        src, dst = edges[:, 0], edges[:, 1]
        safe_src = jnp.where(edge_mask, src, 0)
        safe_dst = jnp.where(edge_mask, dst, num_segments)  # padded -> dummy segment

        def build_features():
            parts = []
            if u is not None:
                u_from, u_to = u[safe_src], u[dst]
                parts += [u_from, u_to, u_to - u_from, (u_to - u_from) ** 2]
            if edge_feats is not None:
                parts.append(edge_feats)
            h_from, h_to = h[safe_src], h[dst]
            parts += [h_from, h_to, h_to - h_from, (h_to - h_from) ** 2]
            return jnp.concatenate(parts, axis=-1)

        feats = build_features()

        # in-degree of each destination over valid edges (balanced weighting)
        ones = edge_mask.astype(jnp.float32)
        degree = jax.ops.segment_sum(ones, safe_dst, num_segments=num_segments + 1)[:-1]

        head_outputs = []
        for head in range(heads):
            inter = _MLP(tuple(p["num_hidden_units_interaction_fct"]), x_dim,
                         output_activation=jnp.tanh,
                         name=f"head_{head}_interaction")(feats)
            if p["use_attention"]:
                att_logit = _MLP(tuple(p["num_hidden_units_attention_fct"]), 1,
                                 name=f"head_{head}_attention")(feats)[..., 0]
                att = _segment_softmax(att_logit, safe_dst, num_segments + 1, edge_mask)
            else:
                att = jnp.where(edge_mask, 1.0 / jnp.maximum(degree[safe_dst], 1.0), 0.0)
            weighted = inter * att[:, None]
            weighted = jnp.where(edge_mask[:, None], weighted, 0.0)
            if p["aggregation_type"] == "max":
                agg = jax.ops.segment_max(
                    jnp.where(edge_mask[:, None], weighted, -jnp.inf),
                    safe_dst, num_segments=num_segments + 1)[:-1]
                agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
            else:
                agg = jax.ops.segment_sum(
                    weighted, safe_dst, num_segments=num_segments + 1)[:-1]
            head_outputs.append(agg)

        if not p["use_attention"] or p["multihead_attention_merge_type"] == "average":
            return sum(head_outputs) / len(head_outputs)
        return jnp.concatenate(head_outputs, axis=-1)


class UpdateFnLSTM(nn.Module):
    """Four dense gates over concat [x, h, u] (update_fn_lstm.py:31-101)."""
    params: Dict[str, Any]

    @nn.compact
    def __call__(self, x, h, c, u):
        p = self.params
        h_dim = p["hidden_node_feature_dim"]
        parts = [x]
        if p["incorporate_hidden_features_in_update"]:
            parts.append(h)
        if p["incorporate_node_input_features_in_update"] and u is not None:
            parts.append(u)
        z = jnp.concatenate(parts, axis=-1)
        ingate = nn.sigmoid(nn.Dense(h_dim, name="ingate")(z))
        outgate = nn.sigmoid(nn.Dense(h_dim, name="outgate")(z))
        forget = nn.sigmoid(nn.Dense(h_dim, name="forgetgate")(z))
        cellinput = jnp.tanh(nn.Dense(h_dim, name="cellinput")(z))
        c = forget * c + ingate * cellinput
        h = outgate * jnp.tanh(c)
        return h, c


class GraphGNN(nn.Module):
    """Batched GraphLSTM over the union graph (graph_gnn.py:46-167)."""
    gnn_params: Optional[Dict[str, Any]] = None
    message_params: Optional[Dict[str, Any]] = None
    update_params: Optional[Dict[str, Any]] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        gp = _merge(DEFAULT_GNN_PARAMS, self.gnn_params)
        mp = _merge(DEFAULT_MESSAGE_PARAMS, self.message_params)
        up = _merge(DEFAULT_UPDATE_PARAMS, self.update_params)

        node_features = inputs.get("node_features")  # [B, N, Dn]
        edges = inputs["interacting_nodes"]          # [B, E, 2] (corrected, padded)
        num_edges = inputs["num_interacting_nodes"]  # [B]

        if gp["num_transition_steps"] == 0:
            return None

        b, n = edges.shape[0], node_features.shape[1]
        m = b * n

        # flatten the batch into one union graph
        offsets = (jnp.arange(b) * n)[:, None, None]
        flat_edges = (edges + offsets).reshape(-1, 2)
        edge_mask = (jnp.arange(edges.shape[1])[None, :] < num_edges[:, None]).reshape(-1)
        edge_feats = inputs.get("edge_features")
        flat_edge_feats = edge_feats.reshape(-1, edge_feats.shape[-1]) if edge_feats is not None else None

        u = None
        if node_features is not None:
            feats = node_features
            if gp["compress_node_feature_dim"] > 0:
                feats = jnp.tanh(nn.Dense(
                    gp["compress_node_feature_dim"], name="compress_input")(feats))
            if gp["dropout_rate_node_features"] > 0 and train:
                feats = nn.Dropout(
                    rate=gp["dropout_rate_node_features"], deterministic=not train,
                    name="dropout_node_features")(feats)
            u = feats.reshape(m, feats.shape[-1])

        h_dim = up["hidden_node_feature_dim"]
        h = jnp.zeros((m, h_dim))
        c = jnp.zeros((m, h_dim))

        message = MessageFn(mp, name="message_fn")
        update = UpdateFnLSTM(up, name="update_fn")
        for _ in range(gp["num_transition_steps"]):
            x = message(u, h, flat_edges, flat_edge_feats, edge_mask, m)
            h, c = update(x, h, c, u)

        out = h.reshape(b, n, h_dim)
        if node_features is not None:
            if gp["output_type"] == "add_final_hidden_and_input":
                out = out + nn.Dense(h_dim, use_bias=False, name="output_proj")(node_features)
            elif gp["output_type"] == "concat_final_hidden_and_input":
                out = jnp.concatenate([out, node_features], axis=-1)
        return out


class GraphRelation(nn.Module):
    """GNN + pairwise relation classifier (graph_relation.py:67-287).

    inputs: num_nodes [B], node_features [B, N, Dn], interacting_nodes
    [B, E, 2], num_interacting_nodes [B], edge_features [B, E, De],
    relations_to_consider [B, R, 2]. Returns logits [B, R, num_classes].

    With ``image_input`` (the 'v' nets): also pass image [B, H, W, C],
    image_shape [B, 2+] and visual_regions_nodes/num_points_visual_regions_
    nodes (and optionally the edge variants); per-region pooled backbone
    features are appended to the node/edge features
    (graph_relation.py:84-172).
    """
    num_classes: int = 2
    classifier_hidden: Sequence[int] = (64, 32)
    gnn_params: Optional[Dict[str, Any]] = None
    message_params: Optional[Dict[str, Any]] = None
    update_params: Optional[Dict[str, Any]] = None
    image_input: bool = False
    visual_backbone: str = "inception_v3"
    visual_from_layers: Optional[Sequence[str]] = None
    visual_compressed_dims: Sequence[int] = (16, 16, 16)
    assign_visual_features_to_nodes: bool = True
    assign_visual_features_to_edges: bool = False

    def _visual_layers(self) -> Sequence[str]:
        if self.visual_from_layers is not None:
            return self.visual_from_layers
        if self.visual_backbone == "inception_v3":
            return ("Mixed_5d", "Mixed_6e", "Mixed_7c")
        if self.visual_backbone == "ARU_cutted_v1":
            # per-scale pre-pool maps of the cutted extractor (1/4..1/16 res)
            return ("res_block_2", "res_block_3", "res_block_4")
        # full-ARU endpoints: multi-resolution down-path features
        return ("scale_0_unet_down_2_conv", "scale_0_unet_down_3_conv",
                "scale_0_unet_down_4_conv")

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        if self.image_input and "image" in inputs:
            from citlab_as_tpu.models.gnn.visual import VisualFeatureExtractor
            extractor = VisualFeatureExtractor(
                backbone=self.visual_backbone,
                from_layers=tuple(self._visual_layers()),
                layer_compressed_dims=tuple(self.visual_compressed_dims),
                name="visual")
            node_vis, edge_vis = extractor(
                inputs["image"], inputs["image_shape"],
                visual_regions_nodes=(
                    inputs.get("visual_regions_nodes")
                    if self.assign_visual_features_to_nodes else None),
                num_points_nodes=inputs.get("num_points_visual_regions_nodes"),
                visual_regions_edges=(
                    inputs.get("visual_regions_edges")
                    if self.assign_visual_features_to_edges else None),
                num_points_edges=inputs.get("num_points_visual_regions_edges"),
                train=train)
            inputs = dict(inputs)
            if node_vis is not None:
                inputs["node_features"] = jnp.concatenate(
                    [inputs["node_features"], node_vis], axis=-1)
            if edge_vis is not None:
                inputs["edge_features"] = jnp.concatenate(
                    [inputs["edge_features"], edge_vis], axis=-1)

        gnn_out = GraphGNN(self.gnn_params, self.message_params,
                           self.update_params, name="GraphLSTM1")(inputs, train)
        if gnn_out is None:
            gnn_out = inputs["node_features"]

        relations = inputs["relations_to_consider"]  # [B, R, 2]
        # gather both nodes' features per relation
        pair_feats = jnp.take_along_axis(
            gnn_out[:, None, :, :],                      # [B, 1, N, D]
            relations[..., None],                        # [B, R, 2, 1]
            axis=2)                                      # [B, R, 2, D]
        b, r = relations.shape[0], relations.shape[1]
        flat = pair_feats.reshape(b, r, -1)
        logits = _MLP(tuple(self.classifier_hidden), self.num_classes,
                      name="Classification")(flat)
        return logits

    def predict_confidences(self, variables, inputs) -> jnp.ndarray:
        """softmax(logits)[..., 1] — the 'belong_to_same_instance'
        probability per relation (model_relation.py:326-342)."""
        logits = self.apply(variables, inputs)
        return jax.nn.softmax(logits, axis=-1)[..., 1]
