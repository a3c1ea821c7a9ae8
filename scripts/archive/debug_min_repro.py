"""Minimal axon repro: execute the exact per-line jits repeatedly.

If call 2 of the raw swt_line_stats_batch / net_prob_sums_batch executables
crashes, the pipeline context is irrelevant and the axon plugin cannot
re-execute THESE executables; otherwise the trigger needs the surrounding
pipeline.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.swt_device import net_prob_sums_batch, swt_line_stats_batch

B, H, W = 7, 1500, 1000
L = 64
SWT_CROP = (64, 1024)
NET_CROP = (64, 1024)


def main():
    rng = np.random.RandomState(0)
    for it in range(3):
        dt = jnp.asarray(rng.randint(0, 9, (B, H, W)).astype(np.uint8))
        prob = jnp.asarray(rng.randint(0, 256, (B, 900, 600)).astype(np.uint8))
        boxes = np.zeros((B, L, 4), np.int32)
        for b in range(B):
            for i in range(L):
                boxes[b, i] = (30, 20 + i * 22, 900, 40)
        nboxes = (boxes * 0.6).astype(np.int32)

        sw = swt_line_stats_batch(dt, jnp.asarray(boxes),
                                  crop_h=SWT_CROP[0], crop_w=SWT_CROP[1])
        print(f"it{it}: sw dispatched", flush=True)
        sums = net_prob_sums_batch(prob, jnp.asarray(nboxes),
                                   crop_h=NET_CROP[0], crop_w=NET_CROP[1])
        print(f"it{it}: sums dispatched", flush=True)
        s = np.asarray(sums)
        w = np.asarray(sw)
        print(f"it{it}: OK sums[0,0]={s[0,0]} sw[0,0]={w[0,0]}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
