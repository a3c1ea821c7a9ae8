"""On-chip probe 2: break down swt_line_stats cost (scan-looped, so
per-dispatch tunnel latency doesn't pollute the numbers).

    python -u scripts/probe_swt2.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.swt_device import (
    _bbox_max, component_stats, net_prob_sums, swt_line_stats)

H, W = 1536, 1024
CROP_H, CROP_W = 64, 512
L = 64


def make_crops(rng):
    """Realistic glyph crops: strokes with small DT values."""
    crops = np.zeros((L, CROP_H, CROP_W), np.int32)
    for l in range(L):
        for x in range(8, CROP_W - 16, 22):
            if rng.rand() < 0.85:
                h0 = rng.randint(4, 30)
                crops[l, 8:8 + h0, x:x + 6] = rng.randint(1, 8)
    return crops


def timeit_scan(fn, n=4):
    out = fn()
    _ = float(np.asarray(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = fn()
    _ = float(np.asarray(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    crops = jnp.asarray(make_crops(rng))
    fg = crops > 0

    @jax.jit
    def stats_loop(crops, fg):
        def body(carry, _):
            lab, mxx, mnx, mxy = component_stats(carry, fg)
            return crops, lab.sum() + mxx.sum()
        _, outs = jax.lax.scan(body, crops, None, length=4)
        return outs

    t = timeit_scan(lambda: stats_loop(crops, fg))
    print(f"component_stats [L={L},{CROP_H}x{CROP_W}]: {t*1e3:.1f} ms", flush=True)

    lab, mxx, mnx, mxy = component_stats(crops, fg)

    @jax.jit
    def bbox_loop(crops, fg, lab, mnx, mxx):
        def body(carry, _):
            r = _bbox_max(carry, fg, lab, mnx, mxx)
            return crops, r.sum()
        _, outs = jax.lax.scan(body, crops, None, length=4)
        return outs

    t = timeit_scan(lambda: bbox_loop(crops, fg, lab, mnx, mxx))
    print(f"_bbox_max (tables + 2 gathers + 1ch fixpoint): {t*1e3:.1f} ms",
          flush=True)

    # full program
    dt_img = jnp.asarray(rng.randint(0, 6, (H, W)).astype(np.uint8))
    boxes = np.zeros((L, 4), np.int32)
    for i in range(L):
        boxes[i] = (30, 20 + i * 22, 460, 40)
    boxes = jnp.asarray(boxes)

    @jax.jit
    def full_loop(dt, boxes):
        def body(carry, _):
            out = swt_line_stats(dt, carry, crop_h=CROP_H, crop_w=CROP_W)
            return boxes, out.sum()
        _, outs = jax.lax.scan(body, boxes, None, length=4)
        return outs

    t = timeit_scan(lambda: full_loop(dt_img, boxes))
    print(f"swt_line_stats full: {t*1e3:.1f} ms", flush=True)

    prob = jnp.asarray(rng.randint(0, 256, (900, 600)).astype(np.uint8))

    @jax.jit
    def np_loop(prob, boxes):
        def body(carry, _):
            out = net_prob_sums(prob, carry, crop_h=64, crop_w=512)
            return boxes, out.sum()
        _, outs = jax.lax.scan(body, boxes, None, length=4)
        return outs

    t = timeit_scan(lambda: np_loop(prob, boxes))
    print(f"net_prob_sums: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
