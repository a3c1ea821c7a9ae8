"""On-chip probe 2: break down remove_small_components cost.

    python -u scripts/probe_cc2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.connected_components import (
    _BG, _component_sizes, _neighbor_min, _run_min, connected_components)
from probe_cc import make_mask, H, W


def timeit(fn, *args, reps=1):
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.RandomState(0)
    mask = jnp.asarray(make_mask(rng))
    fg = np.asarray(mask) != 0
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int32)
    labels0 = jnp.asarray(np.where(fg, idx, int(_BG)))
    fgj = jnp.asarray(fg)

    # iteration count of the labeling fixpoint
    @jax.jit
    def count_iters(labels, fg):
        def body(carry):
            labels, _, it = carry
            new = _run_min(labels, fg)
            new = _run_min(new.T, fg.T).T
            new = _neighbor_min(new, fg)
            return new, jnp.any(new != labels), it + 1
        def cond(carry):
            return carry[1] & (carry[2] < 256)
        _, _, iters = jax.lax.while_loop(
            cond, body, (labels, jnp.bool_(True), 0))
        return jnp.asarray([iters])
    print("fixpoint iterations:",
          int(np.asarray(count_iters(labels0, fgj))[0]), flush=True)

    @jax.jit
    def sweeps10(labels, fg):
        def body(carry, _):
            lab = _run_min(carry, fg)
            return lab, lab.sum()
        out, _ = jax.lax.scan(body, labels, None, length=10)
        return out
    print(f"h run_min sweep: {timeit(sweeps10, labels0, fgj, reps=10)*1e3:.2f} ms",
          flush=True)

    @jax.jit
    def neigh10(labels, fg):
        def body(carry, _):
            lab = _neighbor_min(carry, fg)
            return lab, lab.sum()
        out, _ = jax.lax.scan(body, labels, None, length=10)
        return out
    print(f"neighbor_min sweep: {timeit(neigh10, labels0, fgj, reps=10)*1e3:.2f} ms",
          flush=True)

    labels = connected_components(mask)

    @jax.jit
    def sizes_gather(labels):
        sizes = _component_sizes(labels)
        fg = labels < _BG
        safe = jnp.where(fg, labels, 0)
        keep = fg & (sizes[safe.ravel()].reshape(labels.shape) >= 100)
        return jnp.where(keep, 255, 0).astype(jnp.uint8)
    print(f"sizes+gather: {timeit(sizes_gather, labels)*1e3:.2f} ms", flush=True)

    print(f"connected_components total: {timeit(connected_components, mask)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
