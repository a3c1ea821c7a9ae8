"""Model loading + jitted inference wrappers (the frozen-.pb replacement).

The reference runs frozen TF1 graphs through tf.Session
(net_post_processing_helper.py:36-72, gnn/io.py:12-25). Here models are
orbax checkpoints of flax params; predictors pad inputs to shape buckets so
XLA compiles a handful of programs, then crop back.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.models.arunet import ARUNet
from citlab_as_tpu.models.gnn.graph import (
    batch_graphs, build_full_relations, correct_edges, pad_graph,
)
from citlab_as_tpu.models.gnn.model import GraphRelation
from citlab_as_tpu.train.checkpoint import latest_checkpoint_step, restore_checkpoint

logger = logging.getLogger(__name__)


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


class SegmentationPredictor:
    """ARU-Net forward: grayscale [H, W] in [0, 1] -> probabilities [H, W, C].

    ``model_dir``: orbax checkpoint dir (latest step restored); None -> fresh
    random init (useful before training / in tests, logged loudly).
    """

    def __init__(self, model_dir: Optional[str] = None, n_classes: int = 2,
                 graph_params: Optional[Dict[str, Any]] = None,
                 dtype=jnp.bfloat16, pad_multiple: int = 64, seed: int = 0):
        self.pad_multiple = pad_multiple
        if model_dir is not None and model_dir.endswith(".frozen"):
            from citlab_as_tpu.train.export import load_frozen
            self.model, variables, _ = load_frozen(model_dir)
            logger.info("Loaded frozen ARU-Net from %s", model_dir)
        else:
            self.model = ARUNet(n_classes=n_classes, graph_params=graph_params,
                                dtype=dtype)
            init_x = jnp.zeros((1, 64, 64, 1), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(seed), init_x)
            if model_dir is not None:
                step = latest_checkpoint_step(model_dir)
                state, loaded = restore_checkpoint(model_dir, {"params": variables})
                if loaded is None:
                    raise FileNotFoundError(f"No checkpoint found in {model_dir}")
                variables = state["params"]
                logger.info("Restored ARU-Net params from %s (step %s)",
                            model_dir, step)
            else:
                logger.warning("SegmentationPredictor using RANDOM params "
                               "(no model_dir given).")
        self.variables = variables

        @jax.jit
        def forward(variables, image):
            logits, _ = self.model.apply(variables, image)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = forward

    def __call__(self, image_grey: np.ndarray) -> np.ndarray:
        h, w = image_grey.shape[:2]
        ph = _round_up(h, self.pad_multiple)
        pw = _round_up(w, self.pad_multiple)
        x = np.zeros((1, ph, pw, 1), np.float32)
        x[0, :h, :w, 0] = image_grey
        probs = self._forward(self.variables, jnp.asarray(x))
        return np.asarray(probs)[0, :h, :w, :]

    # measured on v5e at page resolution: throughput scales up to batch 7,
    # then XLA picks a flat ~281 ms conv schedule for any batch >= 8 —
    # chunk large batches below the cliff
    MAX_DEVICE_BATCH = 7

    def predict_batch(self, images: Sequence[np.ndarray]) -> list:
        """Batch same-bucket images for throughput; returns per-image HWC."""
        if not images:
            return []
        if len(images) > self.MAX_DEVICE_BATCH:
            out = []
            for start in range(0, len(images), self.MAX_DEVICE_BATCH):
                out.extend(self.predict_batch(
                    images[start:start + self.MAX_DEVICE_BATCH]))
            return out
        ph = _round_up(max(im.shape[0] for im in images), self.pad_multiple)
        pw = _round_up(max(im.shape[1] for im in images), self.pad_multiple)
        x = np.zeros((len(images), ph, pw, 1), np.float32)
        for i, im in enumerate(images):
            x[i, :im.shape[0], :im.shape[1], 0] = im
        probs = np.asarray(self._forward(self.variables, jnp.asarray(x)))
        return [probs[i, :im.shape[0], :im.shape[1], :]
                for i, im in enumerate(images)]

    def predict_batch_device(self, images: Sequence[np.ndarray]):
        """Dispatch-only variant of :meth:`predict_batch`: returns a zero-arg
        callable that materializes the per-image results when invoked. jit
        dispatch is asynchronous, so callers can enqueue the next batch (and
        do host work) before materializing this one — the device computes in
        the background."""
        if not images or len(images) > self.MAX_DEVICE_BATCH:
            results = self.predict_batch(images)
            return lambda: results
        ph = _round_up(max(im.shape[0] for im in images), self.pad_multiple)
        pw = _round_up(max(im.shape[1] for im in images), self.pad_multiple)
        x = np.zeros((len(images), ph, pw, 1), np.float32)
        for i, im in enumerate(images):
            x[i, :im.shape[0], :im.shape[1], 0] = im
        dev_probs = self._forward(self.variables, jnp.asarray(x))
        shapes = [im.shape[:2] for im in images]

        def materialize():
            probs = np.asarray(dev_probs)
            return [probs[i, :h, :w, :] for i, (h, w) in enumerate(shapes)]
        return materialize


class ShardedSegmentationPredictor(SegmentationPredictor):
    """Multi-chip data-parallel ARU-Net inference over a device mesh.

    The reference shards image lists over host processes
    (run_net_post_processing.py:61-82); here a page batch is sharded over
    the mesh's ``data`` axis with replicated params, and GSPMD derives the
    per-chip program ("computation follows data" — no collectives needed in
    a pure forward). Batches are padded up to a multiple of the data-axis
    size; per-chip sub-batch stays <= MAX_DEVICE_BATCH via chunking in
    :meth:`predict_batch`.
    """

    def __init__(self, model_dir: Optional[str] = None, mesh=None, **kwargs):
        from citlab_as_tpu.parallel.mesh import make_mesh, replicate
        super().__init__(model_dir, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_data = self.mesh.shape["data"]
        self.variables = replicate(self.mesh, self.variables)
        # chunk threshold scales with the data axis: each chip should see
        # at most MAX_DEVICE_BATCH pages
        self.MAX_DEVICE_BATCH = SegmentationPredictor.MAX_DEVICE_BATCH * self.n_data

    def __call__(self, image_grey: np.ndarray) -> np.ndarray:
        return self.predict_batch([image_grey])[0]

    def predict_batch(self, images: Sequence[np.ndarray]) -> list:
        from citlab_as_tpu.parallel.mesh import shard_batch
        if not images:
            return []
        if len(images) > self.MAX_DEVICE_BATCH:
            out = []
            for start in range(0, len(images), self.MAX_DEVICE_BATCH):
                out.extend(self.predict_batch(
                    images[start:start + self.MAX_DEVICE_BATCH]))
            return out
        ph = _round_up(max(im.shape[0] for im in images), self.pad_multiple)
        pw = _round_up(max(im.shape[1] for im in images), self.pad_multiple)
        b = _round_up(len(images), self.n_data)   # divisible batch
        x = np.zeros((b, ph, pw, 1), np.float32)
        for i, im in enumerate(images):
            x[i, :im.shape[0], :im.shape[1], 0] = im
        probs = np.asarray(self._forward(
            self.variables, shard_batch(self.mesh, jnp.asarray(x))))
        return [probs[i, :im.shape[0], :im.shape[1], :]
                for i, im in enumerate(images)]


class RelationPredictor:
    """GraphRelation forward over one page's graph JSON dict -> [N, N]
    confidence matrix (the run_gnn_clustering device step)."""

    def __init__(self, model_dir: Optional[str] = None, num_classes: int = 2,
                 gnn_params=None, message_params=None, update_params=None,
                 node_feature_mask: Optional[Sequence[int]] = None,
                 edge_feature_mask: Optional[Sequence[int]] = None,
                 node_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 image_input: bool = False,
                 visual_backbone: str = "ARU_v1",
                 assign_visual_features_to_nodes: bool = True,
                 assign_visual_features_to_edges: bool = False,
                 image_min_dimension: int = 600,
                 image_max_dimension: int = 1024,
                 seed: int = 0,
                 mesh=None):
        self.model = GraphRelation(
            num_classes=num_classes, gnn_params=gnn_params,
            message_params=message_params, update_params=update_params,
            image_input=image_input, visual_backbone=visual_backbone,
            assign_visual_features_to_nodes=assign_visual_features_to_nodes,
            assign_visual_features_to_edges=assign_visual_features_to_edges)
        self.node_feature_mask = node_feature_mask
        self.edge_feature_mask = edge_feature_mask
        self.node_buckets = list(node_buckets)
        self.image_input = image_input
        self.assign_nodes = assign_visual_features_to_nodes
        self.assign_edges = assign_visual_features_to_edges
        self.image_min_dimension = image_min_dimension
        self.image_max_dimension = image_max_dimension
        self.model_dir = model_dir
        self.seed = seed
        self.variables = None
        # data-parallel inference over a device mesh: page-group batches
        # shard over the mesh's 'data' axis (group bucket rounds up to a
        # multiple of it), params replicate, GSPMD derives the per-chip
        # program — the GNN twin of ShardedSegmentationPredictor
        self.mesh = mesh
        self._n_data = mesh.shape["data"] if mesh is not None else 1

        self._predict = jax.jit(
            lambda v, b: jax.nn.softmax(self.model.apply(v, b), axis=-1)[..., 1])

    def _ensure_params(self, example_inputs):
        if self.variables is not None:
            return
        if self.model_dir is not None and self.model_dir.endswith(".frozen"):
            from citlab_as_tpu.train.export import load_frozen
            self.model, self.variables, _ = load_frozen(self.model_dir)
            logger.info("Loaded frozen GNN from %s", self.model_dir)
            return
        variables = self.model.init(jax.random.PRNGKey(self.seed), example_inputs)
        if self.model_dir is not None:
            state, loaded = restore_checkpoint(self.model_dir, {"params": variables})
            if loaded is None:
                # maybe a best/<metric> export dir
                from citlab_as_tpu.train.checkpoint import _checkpointer, _arrayify
                import os
                if os.path.isdir(self.model_dir):
                    variables = _checkpointer().restore(
                        os.path.abspath(self.model_dir), _arrayify(variables))
                else:
                    raise FileNotFoundError(f"No checkpoint in {self.model_dir}")
            else:
                variables = state["params"]
            logger.info("Restored GNN params from %s", self.model_dir)
        else:
            logger.warning("RelationPredictor using RANDOM params.")
        if self.mesh is not None:
            from citlab_as_tpu.parallel.mesh import replicate
            variables = replicate(self.mesh, variables)
        self.variables = variables

    def _bucket(self, n: int) -> int:
        for b in self.node_buckets:
            if n <= b:
                return b
        # page exceeds the configured buckets: grow to the next power of two
        # and remember it, so the compiled program is reused for subsequent
        # oversized pages instead of (a) clamping and breaking pad_graph or
        # (b) compiling per page
        b = self.node_buckets[-1]
        while b < n:
            b *= 2
        self.node_buckets.append(b)
        logger.info("RelationPredictor: growing node bucket to %d for a "
                    "%d-node page", b, n)
        return b

    @staticmethod
    def _edge_bucket(e: int) -> int:
        """Round the edge count up to a power of two (floor 16) so the jitted
        predict compiles once per bucket instead of once per page (per-page
        exact edge counts give nearly every page a unique shape)."""
        b = 16
        while b < e:
            b *= 2
        return b

    def _visual_inputs(self, graph: dict, image: np.ndarray,
                       max_nodes: int, max_edges: int,
                       max_points: Optional[int] = None) -> dict:
        """image + visual regions -> model input arrays. The page image is
        ratio-resized (image_resizer.py:111-168 contract) and region coords
        are scaled into the resized frame; regions pad to the node/edge
        buckets ([1, N, 2, P] + valid point counts). ``max_points`` lets
        :meth:`confidences_batch` force a shared point bucket across pages."""
        from citlab_as_tpu.ops.image_utils import resize_image_ratio

        orig_h, orig_w = image.shape[:2]
        resized, (th, tw) = resize_image_ratio(
            image, self.image_min_dimension, self.image_max_dimension,
            pad_to_max_dimension=True)
        resized = np.asarray(resized, np.float32)
        if resized.max() > 1.5:
            resized = resized / 255.0
        out = {"image": resized[None, :, :, None],
               "image_shape": np.asarray([[th, tw]], np.int32)}

        def pack(regions, num_points, max_items):
            arr = [np.asarray(r, np.float32) for r in regions]  # [2, P_i]
            # power-of-two point padding: the per-page max point count is
            # another unique-shape recompile source otherwise
            max_p = max_points or self._edge_bucket(
                max(a.shape[1] for a in arr))
            packed = np.zeros((1, max_items, 2, max_p), np.float32)
            counts = np.zeros((1, max_items), np.int32)
            sx, sy = tw / orig_w, th / orig_h
            for i, a in enumerate(arr):
                packed[0, i, 0, :a.shape[1]] = a[0] * sx
                packed[0, i, 1, :a.shape[1]] = a[1] * sy
                counts[0, i] = num_points[i]
            return packed, counts

        if self.assign_nodes and "visual_regions_nodes" in graph:
            packed, counts = pack(graph["visual_regions_nodes"],
                                  graph["num_points_visual_regions_nodes"],
                                  max_nodes)
            out["visual_regions_nodes"] = packed
            out["num_points_visual_regions_nodes"] = counts
        if self.assign_edges and "visual_regions_edges" in graph:
            packed, counts = pack(graph["visual_regions_edges"],
                                  graph["num_points_visual_regions_edges"],
                                  max_edges)
            out["visual_regions_edges"] = packed
            out["num_points_visual_regions_edges"] = counts
        return out

    def _correct_graph(self, graph: dict):
        """Masked + edge-corrected arrays for one page graph."""
        from citlab_as_tpu.train.input_pipeline import apply_feature_masks
        n = int(graph["num_nodes"])
        node_features = apply_feature_masks(
            np.asarray(graph["node_features"], np.float32), self.node_feature_mask)
        edge_features = apply_feature_masks(
            np.asarray(graph["edge_features"], np.float32), self.edge_feature_mask)
        edges, edge_features = correct_edges(
            np.asarray(graph["interacting_nodes"], np.int32), edge_features, n)
        return n, node_features, edges, edge_features

    def confidences(self, graph: dict,
                    image: Optional[np.ndarray] = None) -> np.ndarray:
        return self.confidences_batch(
            [graph], [image] if image is not None else None)[0]

    def _batch_inputs(self, graphs: Sequence[dict],
                      images: Optional[Sequence[np.ndarray]]):
        """Shared-bucket union-graph inputs for a page group.

        Buckets (nodes, edges, group size) are GROW-ONLY across calls: a
        group smaller than a previous one pads up to the seen maximum, so
        the whole corpus runs one executable after the first group —
        distinct shapes cost a remote compile (minutes over the tunnel) or
        at least an executable load each."""
        ns_real = len(graphs)
        group = max(getattr(self, "_group_bucket", 1), ns_real)
        # mesh mode: the union-graph batch shards on its leading (page)
        # axis, so the group bucket must divide evenly over 'data'
        group = -(-group // self._n_data) * self._n_data
        self._group_bucket = group
        graphs = list(graphs) + [graphs[-1]] * (group - ns_real)
        if images is not None:
            images = list(images) + [images[-1]] * (group - len(images))
        corrected = [self._correct_graph(g) for g in graphs]
        ns = [c[0] for c in corrected]
        max_nodes = max(getattr(self, "_node_bucket", 1),
                        self._bucket(max(ns)))
        self._node_bucket = max_nodes
        max_edges = max(getattr(self, "_edges_bucket", 1), self._edge_bucket(
            max(max(len(c[2]) for c in corrected), 1)))
        self._edges_bucket = max_edges
        ns = ns[:ns_real]   # padding pages are sliced away at materialize
        padded = []
        for n, node_features, edges, edge_features in corrected:
            rels, _, _ = build_full_relations(n, None)
            padded.append(pad_graph(
                n, node_features, edges, edge_features, rels, None,
                max_nodes, max_edges, max_nodes * max_nodes))
        inputs = {k: jnp.asarray(v) for k, v in batch_graphs(padded).items()}
        if self.image_input and images is not None:
            max_points = max(getattr(self, "_points_bucket", 1),
                             self._edge_bucket(max(
                max((np.asarray(r).shape[1] for r in
                     g.get("visual_regions_nodes", [])), default=1)
                for g in graphs)))
            self._points_bucket = max_points
            vis = [self._visual_inputs(g, im, max_nodes, max_edges,
                                       max_points=max_points)
                   for g, im in zip(graphs, images)]
            inputs.update({k: jnp.asarray(np.concatenate(
                [v[k] for v in vis], axis=0)) for k in vis[0]})
        return inputs, ns

    def confidences_batch(self, graphs: Sequence[dict],
                          images: Optional[Sequence[np.ndarray]] = None
                          ) -> list:
        """ONE device forward over a whole page group.

        The reference dispatches the relation net per page
        (run_gnn_clustering.py:237-305); the union-graph batching the model
        already consumes (graph_gnn.py:81-119 trick) lets a group of pages
        share a single dispatch — per-page dispatch+readback latency (the
        dominant cost of small GNN programs over the tunnel) is paid once
        per group. Pages pad to the group's shared node/edge buckets.
        Returns a list of [n_i, n_i] confidence arrays."""
        return self.confidences_batch_device(graphs, images)()

    def confidences_batch_device(self, graphs: Sequence[dict],
                                 images: Optional[Sequence[np.ndarray]] = None):
        """Dispatch-only variant of :meth:`confidences_batch`: returns a
        zero-arg callable materializing the per-page results. Lets a pipeline
        driver enqueue the group's GNN forward BEFORE the next group's big
        fused programs so it is not stuck behind them in the in-order device
        queue."""
        inputs, ns = self._batch_inputs(graphs, images)
        if self.mesh is not None:
            from citlab_as_tpu.parallel.mesh import shard_batch
            inputs = shard_batch(self.mesh, inputs)
        self._ensure_params(inputs)
        dev_conf = self._predict(self.variables, inputs)
        from citlab_as_tpu.utils.async_copy import prefetch
        prefetch(dev_conf)

        def materialize():
            conf = np.asarray(dev_conf)
            return [conf[i, :n * n].reshape(n, n) for i, n in enumerate(ns)]
        return materialize

    __call__ = confidences
