"""On-chip probe: connected-components labeling cost at page resolution.

Times `remove_small_components` (the fused separator pipeline's dominant
device op) single-image and vmapped batch-7, using a lax.scan loop inside
one jit (per-dispatch tunnel latency ~5-10 ms would otherwise pollute the
numbers) and a device scalar read as the completion barrier.

    python -u scripts/probe_cc.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.connected_components import (
    connected_components, remove_small_components)

H, W = 1536, 1024


def make_mask(rng):
    """Separator-net-like thresholded mask: column rules + text strokes."""
    img = np.zeros((H, W), np.uint8)
    for c in (340, 680):
        img[40:H - 40, c - 2:c + 2] = 255
    y = 80
    while y < H - 60:
        for x in range(30, W - 40, 22):
            if rng.rand() < 0.85:
                img[y - 26:y - 2, x:x + 6] = 255
        y += 64
    img[rng.rand(H, W) < 0.001] = 255
    return img


def timeit(fn, arg, iters=8):
    out = fn(arg)
    _ = float(np.asarray(out.reshape(-1)[0]))  # barrier + warm
    t0 = time.perf_counter()
    out = fn(arg)
    _ = float(np.asarray(out.reshape(-1)[0]))
    dt = time.perf_counter() - t0
    return dt


def main():
    rng = np.random.RandomState(0)
    mask = jnp.asarray(make_mask(rng))
    batch = jnp.asarray(np.stack([make_mask(rng) for _ in range(7)]))

    @jax.jit
    def single_loop(m):
        def body(carry, _):
            out = remove_small_components(carry, jnp.int32(100))
            return m, out.astype(jnp.int32).sum()
        _, outs = jax.lax.scan(body, m, None, length=4)
        return outs

    @jax.jit
    def batch_loop(ms):
        def body(carry, _):
            out = jax.vmap(
                lambda b: remove_small_components(b, jnp.int32(100)))(carry)
            return ms, out.astype(jnp.int32).sum()
        _, outs = jax.lax.scan(body, ms, None, length=2)
        return outs

    dt1 = timeit(single_loop, mask) / 4
    print(f"remove_small_components single {H}x{W}: {dt1*1e3:.1f} ms", flush=True)
    dt7 = timeit(batch_loop, batch) / 2
    print(f"remove_small_components vmapped batch-7: {dt7*1e3:.1f} ms "
          f"({dt7/7*1e3:.1f} ms/image)", flush=True)

    # iteration count diagnostic (host-level while, labels only)
    lab = connected_components(mask)
    print("labels ok:", int(np.asarray((lab < (1 << 30)).sum())), "fg px", flush=True)


if __name__ == "__main__":
    main()
