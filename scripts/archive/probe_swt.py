"""On-chip probe: device SWT pipeline costs at production sizes.

- vmapped JFA distance transform, batch 7 @ 1536x1024 (fused heading A)
- swt_line_stats for one page (L=64 lines, 64x512 crops) (program B)
- net_prob_means for one page

    python -u scripts/probe_swt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.binarize import otsu_binarize
from citlab_as_tpu.ops.distance_transform import distance_transform_edt
from citlab_as_tpu.ops.swt_device import net_prob_means, swt_line_stats

H, W = 1536, 1024


def make_page(rng):
    img = np.full((H, W), 255, np.uint8)
    for c in (340, 680):
        img[40:H - 40, c - 2:c + 2] = 40
    y = 80
    while y < H - 60:
        for x in range(30, W - 40, 22):
            if rng.rand() < 0.85:
                img[y - 26:y - 2, x:x + 6] = 0
        y += 64
    return img


def timeit(fn, *args, inner=1):
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out.reshape(-1)[0]))
    return (time.perf_counter() - t0) / inner


def main():
    rng = np.random.RandomState(0)
    batch = jnp.asarray(np.stack([make_page(rng) for _ in range(7)]))

    @jax.jit
    def dt_batch(imgs):
        def one(img):
            inv = 255 - img.astype(jnp.float32)
            _, binary = otsu_binarize(inv, blur_ksize=5)
            return distance_transform_edt(binary, cap=255.0).astype(jnp.uint8)
        return jax.vmap(one)(imgs)

    dt = timeit(dt_batch, batch)
    print(f"blur+otsu+JFA EDT batch-7 @ {H}x{W}: {dt*1e3:.1f} ms "
          f"({dt/7*1e3:.1f} ms/page)", flush=True)

    dt_img = np.asarray(dt_batch(batch))[0]
    boxes = []
    y = 80
    while y < H - 60 and len(boxes) < 64:
        boxes.append((30, y - 30, 460, 34))
        y += 64
    while len(boxes) < 64:
        boxes.append((0, 0, 0, 0))
    boxes = jnp.asarray(np.asarray(boxes, np.int32))
    dtj = jnp.asarray(dt_img)

    t = timeit(lambda b: swt_line_stats(dtj, b, crop_h=64, crop_w=512), boxes)
    print(f"swt_line_stats 64 lines 64x512: {t*1e3:.1f} ms/page", flush=True)

    prob = jnp.asarray(rng.randint(0, 256, (900, 600)).astype(np.uint8))
    nboxes = (np.asarray(boxes) * 0.6).astype(np.int32)
    t = timeit(lambda b: net_prob_means(prob, b, crop_h=32, crop_w=512),
               jnp.asarray(nboxes))
    print(f"net_prob_means 64 lines: {t*1e3:.1f} ms/page", flush=True)


if __name__ == "__main__":
    main()
