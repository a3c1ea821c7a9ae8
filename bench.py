"""Benchmark: ARU-Net separator inference throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >= 50 full pages/s end-to-end on a v5e-8. This measures the
dominant-FLOPs piece — ARU-Net forward at the separator stage's working
resolution (fixed_height 1500 -> 1536x1024 padded) — in pages/s on ONE
chip; vs_baseline = value / (50/8), the per-chip north-star share.

Methodology: inputs vary per iteration; the loop queues ITERS dispatches
and then fetches a scalar from the LAST output (under the axon tunnel,
block_until_ready returns immediately, so a device->host read is the only
reliable completion barrier); throughput = ITERS * BATCH / wall time, which
amortizes the tunnel round-trip over the pipelined executions.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.models.arunet import ARUNet

H, W = 1536, 1024  # fixed_height-1500 page padded to a multiple of 16
# batch 7 in bf16 is the measured sweet spot on v5e: throughput scales to
# B=7 (62+ pages/s), then XLA switches to a flat ~281 ms conv schedule for
# every B>=8 (measured B=8..15), so bigger batches LOSE throughput
BATCH = 7
WARMUP = 3
ITERS = 10


def main():
    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    # host->device over the axon tunnel is slow (~1 MB/s), so place a few
    # distinct inputs up front (outside the timed region) and cycle them
    inputs = [jax.device_put(jnp.asarray(
                  np.asarray(rng.rand(BATCH, H, W, 1), np.float32)
              ).astype(jnp.bfloat16)) for _ in range(3)]
    variables = model.init(jax.random.PRNGKey(0), inputs[0][:1])

    @jax.jit
    def forward(variables, image):
        logits, _ = model.apply(variables, image)
        return jax.nn.softmax(logits, axis=-1)

    def fetch_scalar(out):
        # device->host read = reliable completion barrier on this backend
        return float(np.asarray(out[0, 0, 0, 0]))

    for i in range(WARMUP):
        fetch_scalar(forward(variables, inputs[i % len(inputs)]))

    t0 = time.perf_counter()
    out = None
    for i in range(ITERS):
        out = forward(variables, inputs[i % len(inputs)])
    fetch_scalar(out)
    total = time.perf_counter() - t0

    dt = total / ITERS
    pages_per_s = BATCH / dt
    mpix_per_s = pages_per_s * H * W / 1e6
    north_star_per_chip = 50.0 / 8.0
    edge_preds_per_s = _bench_gnn()
    print(json.dumps({
        "metric": f"ARU-Net separator forward pages/s ({H}x{W}, batch {BATCH}, 1 chip)",
        "value": round(pages_per_s, 3),
        "unit": "pages/s",
        "vs_baseline": round(pages_per_s / north_star_per_chip, 3),
        "extra": {"MPix/s": round(mpix_per_s, 1),
                  "median_batch_ms": round(dt * 1e3, 2),
                  "gnn_edge_preds_per_s": round(edge_preds_per_s),
                  "device": str(jax.devices()[0])},
    }))


def _bench_gnn(batch_graphs_n: int = 8, nodes: int = 128, iters: int = 20):
    """Secondary metric: relation-GNN edge predictions/s (full N^2 grid)."""
    from citlab_as_tpu.models.gnn.graph import (
        batch_graphs, build_full_relations, correct_edges, pad_graph)
    from citlab_as_tpu.models.gnn.model import GraphRelation
    from citlab_as_tpu.stages.features import delaunay_edges

    rng = np.random.RandomState(0)
    graphs = []
    for _ in range(batch_graphs_n):
        edges = delaunay_edges(nodes, rng.rand(nodes, 2) * 1000)
        efeat = rng.rand(len(edges), 2).astype(np.float32)
        edges, efeat = correct_edges(edges, efeat, nodes)
        rels, _, gts = build_full_relations(nodes, None)
        graphs.append(pad_graph(
            nodes, rng.rand(nodes, 15).astype(np.float32), edges, efeat,
            rels, gts, nodes, 1024, nodes * nodes))
    batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in batch_graphs(graphs).items()})
    model = GraphRelation(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(lambda v, b: jax.nn.softmax(model.apply(v, b), -1)[..., 1])
    float(np.asarray(fwd(variables, batch)[0, 0]))   # compile + barrier
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, batch)
    float(np.asarray(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    return batch_graphs_n * nodes * nodes / dt


if __name__ == "__main__":
    main()
