"""Decompose the ARU-Net forward cost on-chip: full net, detCNN pyramid
levels, attention net, logits — each timed with an in-jit scan loop (one
dispatch per measurement). Calibrates which blocks to optimize.

Usage: python -u scripts/probe_aru.py [--batch 7]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.models.arunet import ARUNet, _DetCNN, _AttCNN, DEFAULT_GRAPH_PARAMS

H, W = 1536, 1024
LOOP = 8


def timeit_fused(step, x0, iters=3):
    @jax.jit
    def many(x):
        def body(carry, _):
            y = step(carry)
            # re-inject the carry shape: mix output back into input
            return carry + 0.0 * y.reshape(-1)[0].astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=LOOP)
        return out

    barrier = lambda o: float(o.reshape(-1)[0])
    barrier(many(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(x0)
    barrier(out)
    return (time.perf_counter() - t0) / (iters * LOOP)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=7)
    args = ap.parse_args()
    B = args.batch

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 1), jnp.bfloat16)

    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32))

    t = timeit_fused(lambda im: model.apply(variables, im)[0], x)
    print(f"full ARU fwd: {t*1e3:8.2f} ms  ({B*H*W/t/1e6:7.1f} MPix/s)")

    # detCNN alone at each pyramid resolution
    det = _DetCNN(graph_params=DEFAULT_GRAPH_PARAMS, dtype=jnp.bfloat16)
    for lvl in range(3):
        h, w = H >> lvl, W >> lvl
        xi = jnp.asarray(rng.rand(B, h, w, 1), jnp.bfloat16)
        vi = det.init(jax.random.PRNGKey(0), xi[:1].astype(jnp.float32))
        tl = timeit_fused(lambda im, vi=vi: det.apply(vi, im), xi)
        print(f"detCNN @ {h}x{w}: {tl*1e3:8.2f} ms")

    att = _AttCNN(graph_params=DEFAULT_GRAPH_PARAMS, dtype=jnp.bfloat16)
    va = att.init(jax.random.PRNGKey(0), x[:1].astype(jnp.float32))
    ta = timeit_fused(lambda im: att.apply(va, im), x)
    print(f"attCNN @ {H}x{W}: {ta*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
