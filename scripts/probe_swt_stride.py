"""On-chip A/B of the stride-capped per-line SWT fixpoint (VERDICT r4 #5).

Times the full per-line program (ops/swt_device.line_features_batch) at
production shapes (7x1536x1024 group, 48x512 crop bucket) on realistic
text-like pages for stride in {0 (uncapped), 64, 32, 16}, and checks the
packed outputs are bit-identical (the cap is exactness-preserving: the
fixpoint convergence check absorbs the shorter sweeps).

Usage: python -u scripts/probe_swt_stride.py [--noise] [strides...]

--noise swaps the text pages for uniform random noise — Otsu binarizes it
into percolating components, driving the CC fixpoint to worst-case
iteration counts (the probe_device_times.py regime where the program
measures ~320 ms/group vs ~41 on realistic strokes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
B, H, W = 7, 1536, 1024
L = 64
CROP_H, CROP_W = 48, 512


def barrier(x):
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def main():
    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import jax.numpy as jnp
    import numpy as np

    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.stages.heading import make_fused_heading_swt_fn
    from citlab_as_tpu.ops import swt_device as sd
    from scripts.probe_swt_parts import make_text_page

    argv = sys.argv[1:]
    noise = "--noise" in argv
    argv = [a for a in argv if a != "--noise"]
    strides = [int(a) for a in argv] or [0, 64, 32, 16]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head = SegmentationPredictor(os.path.join(repo, "models_ckpt/heading"))

    rng = np.random.RandomState(0)
    imgs, all_boxes = [], []
    for _ in range(B):
        if noise:
            im = rng.randint(0, 256, (H, W), dtype=np.uint8)
            bx = [(30 + 10 * (i % 3), 40 + 22 * i, 400, 34)
                  for i in range(L)]
        else:
            im, bx = make_text_page(rng)
        imgs.append(im)
        all_boxes.append(bx)
    batch = jnp.asarray(np.stack(imgs))
    barrier(batch)

    head_swt = make_fused_heading_swt_fn(head.model)
    prob_u8, dt_u8 = head_swt(head.variables, batch, out_h=900, out_w=600)
    barrier(dt_u8)
    print("head_swt done", flush=True)

    sb = np.zeros((B, L, 4), np.int32)
    nb = np.zeros((B, L, 4), np.int32)
    for b in range(B):
        for i, (x, y, w, h) in enumerate(all_boxes[b][:L]):
            sb[b, i] = (x, y, w, h)
            nb[b, i] = (int(x * 0.6), int(y * 0.6), int(w * 0.6),
                        int(h * 0.6))
    sbj, nbj = jnp.asarray(sb), jnp.asarray(nb)
    barrier(sbj)

    out = {"shape": f"{B}x{H}x{W}",
           "lines": sum(len(b) for b in all_boxes),
           "bucket": f"{L}l {CROP_H}x{CROP_W}"}
    results = {}
    for s in strides:
        fn = lambda: sd.line_features_batch(
            dt_u8, prob_u8, sbj, nbj, crop_h=CROP_H, crop_w=CROP_W,
            mxu=True, stride=s)
        r = fn()
        barrier(r)
        results[s] = np.asarray(r)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            barrier(fn())
            best = min(best, time.perf_counter() - t0)
        out[f"stride_{s}_ms"] = round(best * 1000, 1)
        print(f"stride={s}: {out[f'stride_{s}_ms']} ms/group", flush=True)

    ref = results[strides[0]]
    for s in strides[1:]:
        same = bool(np.array_equal(ref, results[s]))
        out[f"stride_{s}_exact"] = same
        if not same:
            print(f"MISMATCH stride={s}: "
                  f"{np.sum(ref != results[s])} cells differ", flush=True)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
