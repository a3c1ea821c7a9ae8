"""Contained repro: fused heading forward feeding the per-line jits, looped.

No separator stage, no XML — just upload a batch, run the big fused program
(forward + device SWT), slice [:b], run the two per-line programs, read back.
If it1 crashes, the trigger is consuming another executable's outputs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

B, H, W = 7, 1500, 1000
L = 64
SWT_CROP = (64, 1024)
NET_CROP = (64, 1024)


def main():
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.ops.swt_device import (net_prob_sums_batch,
                                              swt_line_stats_batch)
    from citlab_as_tpu.stages.heading import make_fused_heading_swt_fn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    mdir = "models_ckpt/heading"
    head = SegmentationPredictor(mdir if os.path.isdir(mdir) else None)
    fused = make_fused_heading_swt_fn(head.model)

    rng = np.random.RandomState(0)
    boxes = np.zeros((B, L, 4), np.int32)
    for b in range(B):
        for i in range(L):
            boxes[b, i] = (30, 20 + i * 22, 900, 40)
    nboxes = (boxes * 0.6).astype(np.int32)

    for it in range(3):
        batch = jnp.asarray(
            rng.randint(0, 256, (B, H, W)).astype(np.uint8))
        maps_u8, dt_u8 = fused(head.variables, batch, out_h=900, out_w=600,
                               pad_multiple=64)
        print(f"it{it}: fused dispatched", flush=True)
        sw = swt_line_stats_batch(dt_u8[:B], jnp.asarray(boxes),
                                  crop_h=SWT_CROP[0], crop_w=SWT_CROP[1])
        sums = net_prob_sums_batch(maps_u8[:B], jnp.asarray(nboxes),
                                   crop_h=NET_CROP[0], crop_w=NET_CROP[1])
        print(f"it{it}: per-line dispatched", flush=True)
        s = np.asarray(sums)
        w = np.asarray(sw)
        print(f"it{it}: OK sums[0,0]={s[0,0]} sw[0,0]={w[0,0]}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
