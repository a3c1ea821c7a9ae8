"""Visual features for the relation GNN (the 'v' in mixed_gnn_vn7e2).

Reference: graph_relation.py:84-172 + graph_util/misc.py:249-508 +
feature_map_generators.py:72-197. A visual backbone (Inception v3 endpoints
Mixed_5d/6e/7c, or an ARU feature extractor) produces multi-resolution
feature maps; per region, the map cells inside the region's bbox are
max-pooled and compressed to 16-d per map; the concatenated 48-d vector is
appended to the node (or edge) features.

TPU-first pooling: instead of the reference's per-region tf.while_loop with
dynamic slices, the bbox max-pool is a masked reduction vmapped over
regions — static shapes, fully fused.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def normalize_visual_regions(visual_regions: jnp.ndarray,
                             true_image_shape: jnp.ndarray,
                             pad_image_height: int,
                             pad_image_width: int) -> jnp.ndarray:
    """Scale region coords (relative to the true image) into the padded
    image's relative frame (misc.py:249-269).

    visual_regions: [B, N, 2, P] (row 0 = x, row 1 = y) in absolute pixels
    relative to the true image; true_image_shape: [B, 2+] (h, w, ...).
    Output is relative (0..1) w.r.t. the padded extent.
    """
    b = true_image_shape.shape[0]
    # absolute pixels -> padded-relative: divide by the padded extent
    sx = jnp.full((b,), 1.0 / pad_image_width, jnp.float32)
    sy = jnp.full((b,), 1.0 / pad_image_height, jnp.float32)
    scale = jnp.stack([sx, sy], axis=1)  # [B, 2]
    return visual_regions * scale[:, None, :, None]


def _bbox_from_regions(regions: jnp.ndarray, num_points: jnp.ndarray):
    """[B, N, 2, P] + valid point counts -> (xmin, xmax, ymin, ymax) each
    [B, N] (make_paraxial_rectangular analog, padded points masked)."""
    p = regions.shape[-1]
    idx = jnp.arange(p)[None, None, :]
    valid = idx < num_points[..., None]
    x = regions[:, :, 0, :]
    y = regions[:, :, 1, :]
    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(valid, x, big), axis=-1)
    xmax = jnp.max(jnp.where(valid, x, -big), axis=-1)
    ymin = jnp.min(jnp.where(valid, y, big), axis=-1)
    ymax = jnp.max(jnp.where(valid, y, -big), axis=-1)
    return xmin, xmax, ymin, ymax


def region_max_pool(feature_map: jnp.ndarray, xmin, xmax, ymin, ymax
                    ) -> jnp.ndarray:
    """Max of feature-map cells inside each region's bbox.

    feature_map: [B, H, W, C]; bounds: [B, N] relative coords. The cell range
    follows the reference exactly: floor(coord * dim) clipped to [0, dim-1],
    inclusive. Returns [B, N, C].
    """
    b, h, w, c = feature_map.shape
    fx0 = jnp.clip(jnp.floor(xmin * w), 0, w - 1)
    fx1 = jnp.clip(jnp.floor(xmax * w), 0, w - 1)
    fy0 = jnp.clip(jnp.floor(ymin * h), 0, h - 1)
    fy1 = jnp.clip(jnp.floor(ymax * h), 0, h - 1)
    fx1 = jnp.maximum(fx1, fx0)
    fy1 = jnp.maximum(fy1, fy0)

    cols = jnp.arange(w)[None, None, :]
    rows = jnp.arange(h)[None, None, :]
    col_mask = (cols >= fx0[..., None]) & (cols <= fx1[..., None])  # [B, N, W]
    row_mask = (rows >= fy0[..., None]) & (rows <= fy1[..., None])  # [B, N, H]

    neg = jnp.float32(-1e30)
    # masked reductions; XLA fuses the selects into the reduces so the
    # [B, N, H, W, C] intermediate never materializes in HBM
    fm = feature_map  # [B, H, W, C]
    masked_w = jnp.where(col_mask[:, :, None, :, None],
                         fm[:, None, :, :, :], neg)      # fused
    row_max = jnp.max(masked_w, axis=3)                  # [B, N, H, C]
    masked_h = jnp.where(row_mask[:, :, :, None], row_max, neg)
    return jnp.max(masked_h, axis=2)                     # [B, N, C]


class MultiResolutionFeatureMaps(nn.Module):
    """SSD-style multi-resolution maps from backbone endpoints
    (feature_map_generators.py:72-197).

    ``from_layers[i]`` names an endpoint; ``layer_depths[i]`` == -1 passes it
    through unchanged, > 0 projects it with a 1x1 conv. An empty
    ``from_layers[i]`` builds a NEW map from the previous one: optional 1x1
    conv to depth//2 (``insert_1x1_conv``) then a stride-2 3x3 conv to
    ``layer_depths[i]``. All convs relu-activated, as in the reference.
    """
    from_layers: Sequence[str] = ("Mixed_5d", "Mixed_6e", "Mixed_7c")
    layer_depths: Sequence[int] = (-1, -1, -1)
    insert_1x1_conv: bool = True
    min_depth: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, endpoints: Dict[str, jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        maps: List[jnp.ndarray] = []
        for i, (name, depth) in enumerate(zip(self.from_layers,
                                              self.layer_depths)):
            if name:
                fm = endpoints[name]
                if depth > 0:
                    fm = nn.relu(nn.Conv(
                        max(depth, self.min_depth), (1, 1), dtype=self.dtype,
                        name=f"proj_{i}_{name}")(fm))
            else:
                if not maps:
                    raise ValueError(
                        "empty from_layer needs a previous feature map")
                fm = maps[-1]
                depth = max(depth, self.min_depth)
                if self.insert_1x1_conv:
                    fm = nn.relu(nn.Conv(
                        max(depth // 2, self.min_depth), (1, 1),
                        dtype=self.dtype, name=f"reduce_{i}")(fm))
                fm = nn.relu(nn.Conv(
                    depth, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name=f"down_{i}")(fm))
            maps.append(fm)
        return maps


class VisualFeatureExtractor(nn.Module):
    """Backbone endpoints -> per-region compressed visual features
    (graph_relation.py:84-172)."""
    backbone: str = "inception_v3"
    from_layers: Sequence[str] = ("Mixed_5d", "Mixed_6e", "Mixed_7c")
    layer_depths: Sequence[int] = (-1, -1, -1)   # -1 = passthrough endpoint
    layer_compressed_dims: Sequence[int] = (16, 16, 16)
    dtype: Any = jnp.float32

    def _build_backbone(self):
        if self.backbone == "inception_v3":
            from citlab_as_tpu.models.inception_v3 import InceptionV3
            return InceptionV3(dtype=self.dtype, name="backbone")
        if self.backbone == "ARU_v1":
            from citlab_as_tpu.models.arunet import ARUNet
            return ARUNet(n_classes=2, dtype=self.dtype, name="backbone")
        if self.backbone == "ARU_cutted_v1":
            # down-path-only extractor: ~half the FLOPs of a full ARU
            # forward when only multi-resolution features are consumed
            from citlab_as_tpu.models.arunet import ARUCutted
            return ARUCutted(dtype=self.dtype, name="backbone")
        raise ValueError(f"Unknown visual backbone '{self.backbone}'")

    @nn.compact
    def __call__(self, image: jnp.ndarray, image_shape: jnp.ndarray,
                 visual_regions_nodes: Optional[jnp.ndarray] = None,
                 num_points_nodes: Optional[jnp.ndarray] = None,
                 visual_regions_edges: Optional[jnp.ndarray] = None,
                 num_points_edges: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """image: [B, H, W, C]; image_shape: [B, 2+] true (h, w); regions in
        absolute pixel coords [B, N, 2, P]. Returns (node_feats, edge_feats)
        ([B, N, sum(compressed)] or None)."""
        backbone = self._build_backbone()
        _, endpoints = backbone(image, train)
        feature_maps = MultiResolutionFeatureMaps(
            from_layers=self.from_layers, layer_depths=self.layer_depths,
            dtype=self.dtype, name="feature_maps")(endpoints, train)

        pad_h, pad_w = image.shape[1], image.shape[2]

        def pooled_features(regions, num_points, scope):
            norm = normalize_visual_regions(regions, image_shape, pad_h, pad_w)
            xmin, xmax, ymin, ymax = _bbox_from_regions(norm, num_points)
            feats = []
            for fm_idx, fm in enumerate(feature_maps):
                pooled = region_max_pool(
                    fm.astype(jnp.float32), xmin, xmax, ymin, ymax)
                compressed = nn.relu(nn.Dense(
                    self.layer_compressed_dims[fm_idx],
                    name=f"{scope}_compress_fm_{fm_idx}")(pooled))
                feats.append(compressed)
            return jnp.concatenate(feats, axis=-1)

        node_feats = None
        if visual_regions_nodes is not None:
            node_feats = pooled_features(
                visual_regions_nodes, num_points_nodes, "visual_node")
        edge_feats = None
        if visual_regions_edges is not None:
            edge_feats = pooled_features(
                visual_regions_edges, num_points_edges, "visual_edge")
        return node_feats, edge_feats
