"""repro4's tight loop + the separator stage run ONCE at the start.

If it1 crashes, the separator stage's device footprint (loaded executables /
live buffers) is the missing trigger ingredient.
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp
import numpy as np

B, H, W = 7, 1500, 1000
L = 128
SWT_CROP = (64, 512)
NET_CROP = (32, 512)
COUNTS = [43, 66, 43, 66, 64, 66, 65]


def main():
    from bench_e2e import make_demo_page
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.ops.swt_device import (net_prob_sums_batch,
                                              swt_line_stats_batch)
    from citlab_as_tpu.stages.heading import make_fused_heading_swt_fn
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))

    work = "/tmp/debug_min5"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"w{i:03d}", rng)[0] for i in range(7)]
    sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
    sp.run_batched(batch_size=7)
    print("separator done (once)", flush=True)

    fused = make_fused_heading_swt_fn(head.model)
    boxes = np.zeros((B, L, 4), np.int32)
    nboxes = np.zeros((B, L, 4), np.int32)
    for b in range(B):
        for i in range(COUNTS[b]):
            boxes[b, i] = (30 + (i % 3) * 300, 20 + (i % 60) * 22, 441, 35)
            nboxes[b, i] = (18 + (i % 3) * 180, 12 + (i % 60) * 13, 265, 22)

    for it in range(3):
        batch = jnp.asarray(
            rng.randint(0, 256, (B, H, W)).astype(np.uint8))
        maps_u8, dt_u8 = fused(head.variables, batch, out_h=900, out_w=600,
                               pad_multiple=64)
        sw = swt_line_stats_batch(dt_u8[:B], jnp.asarray(boxes),
                                  crop_h=SWT_CROP[0], crop_w=SWT_CROP[1])
        sums = net_prob_sums_batch(maps_u8[:B], jnp.asarray(nboxes),
                                   crop_h=NET_CROP[0], crop_w=NET_CROP[1])
        s = np.asarray(sums)
        w = np.asarray(sw)
        print(f"it{it}: OK sums[0,0]={s[0,0]} sw[0,0]={w[0,0]}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
