"""On-chip primitive probe: where do CC sweeps lose 30x vs theory?

Times one doubling run-min sweep, one 3x3 reduce_window min, and one plain
roll+min, at page shape vs crop-stack shape vs batched page shape.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python -u scripts/probe_prim.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.connected_components import _BG, _neighbor_min, _run_min


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / n


def probe(shape, rng):
    fg = jnp.asarray(rng.rand(*shape) < 0.15)
    labels = jnp.where(fg, jnp.arange(np.prod(shape), dtype=jnp.int32
                                      ).reshape(shape), _BG)
    mb = np.prod(shape) * 4 / 1e6

    if len(shape) == 2:
        run = _run_min
        neigh = _neighbor_min
    else:
        run = jax.vmap(_run_min)
        neigh = jax.vmap(_neighbor_min)

    @jax.jit
    def run10(lab, fg):
        def body(c, _):
            out = run(c, fg)
            return out, out.sum()
        out, _ = jax.lax.scan(body, lab, None, length=10)
        return out

    @jax.jit
    def neigh10(lab, fg):
        def body(c, _):
            out = neigh(c, fg)
            return out, out.sum()
        out, _ = jax.lax.scan(body, lab, None, length=10)
        return out

    @jax.jit
    def rollmin10(lab, fg):
        def body(c, _):
            out = jnp.minimum(c, jnp.roll(c, 1, axis=-1))
            return out, out.sum()
        out, _ = jax.lax.scan(body, lab, None, length=10)
        return out

    t_run = timeit(run10, labels, fg)
    t_ne = timeit(neigh10, labels, fg)
    t_roll = timeit(rollmin10, labels, fg)
    print(f"{str(shape):>18} ({mb:5.1f} MB): run_min {t_run*1e3:6.2f} ms | "
          f"3x3 win {t_ne*1e3:6.2f} ms | roll+min {t_roll*1e3:6.2f} ms",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    probe((1536, 1024), rng)
    probe((4096, 512), rng)
    probe((64, 64, 512), rng)
    probe((7, 1536, 1024), rng)


if __name__ == "__main__":
    main()
