"""On-chip probe 2: swt device program costs, batched over a page group
(scan-looped so per-dispatch tunnel latency doesn't pollute the numbers).

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python -u scripts/probe_swt2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.swt_device import (
    _extract_crops, _line_stats_from_crops, component_stats,
    net_prob_sums_batch, swt_line_stats_batch)

H, W = 1536, 1024
CROP_H, CROP_W = 64, 512
L = 64
B = 7


def make_dt(rng):
    dt = np.zeros((H, W), np.uint8)
    y = 30
    while y < H - 40:
        for x in range(8, W - 16, 22):
            if rng.rand() < 0.85:
                h0 = rng.randint(4, 30)
                dt[y:y + h0, x:x + 6] = rng.randint(1, 8)
        y += 40
    return dt


def timeit_scan(fn, n=4):
    out = fn()
    _ = float(np.asarray(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = fn()
    _ = float(np.asarray(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    dt_batch = jnp.asarray(np.stack([make_dt(rng) for _ in range(B)]))
    boxes = np.zeros((B, L, 4), np.int32)
    for b in range(B):
        for i in range(L):
            boxes[b, i] = (30, 20 + i * 22, 460, 40)
    boxes = jnp.asarray(boxes)

    @jax.jit
    def crops_loop(dt, bx):
        def body(carry, _):
            c = _extract_crops(dt[0], carry[0], CROP_H, CROP_W, True)
            return bx, c.sum()
        _, outs = jax.lax.scan(body, bx, None, length=4)
        return outs

    t = timeit_scan(lambda: crops_loop(dt_batch, boxes))
    print(f"_extract_crops single page (L={L}): {t*1e3:.1f} ms", flush=True)

    @jax.jit
    def stats_loop(dt, bx):
        def body(carry, _):
            out = swt_line_stats_batch(dt, carry, crop_h=CROP_H, crop_w=CROP_W)
            return bx, out.sum()
        _, outs = jax.lax.scan(body, bx, None, length=2)
        return outs

    t = timeit_scan(lambda: stats_loop(dt_batch, boxes), n=2)
    print(f"swt_line_stats_batch B={B}: {t*1e3:.1f} ms "
          f"({t/B*1e3:.1f} ms/page)", flush=True)

    prob = jnp.asarray(
        rng.randint(0, 256, (B, 900, 600)).astype(np.uint8))
    nboxes = jnp.asarray((np.asarray(boxes) * 0.6).astype(np.int32))

    @jax.jit
    def np_loop(prob, bx):
        def body(carry, _):
            out = net_prob_sums_batch(prob, carry, crop_h=64, crop_w=512)
            return bx, out.sum()
        _, outs = jax.lax.scan(body, bx, None, length=4)
        return outs

    t = timeit_scan(lambda: np_loop(prob, nboxes))
    print(f"net_prob_sums_batch B={B}: {t*1e3:.1f} ms "
          f"({t/B*1e3:.1f} ms/page)", flush=True)


if __name__ == "__main__":
    main()
