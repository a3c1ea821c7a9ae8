"""Per-program device times for the workflow's chip-side programs.

Times each device program in isolation (scalar-read completion barriers —
block_until_ready returns immediately under the axon tunnel) at production
shapes: 7-page 1536x1024 groups, the round-3 heading per-line bucket sizes.
Prints one JSON dict of ms per program per GROUP (divide by 7 for per-page).

Usage: python -u scripts/probe_device_times.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
B, H, W = 7, 1536, 1024


def barrier(x):
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def timed(name, fn, out):
    # warm (compile / cache load)
    barrier(fn())
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        barrier(fn())
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best * 1000, 1)
    print(f"{name}: {out[name]} ms", flush=True)


def main():
    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.ops.binarize import otsu_binarize
    from citlab_as_tpu.ops.distance_transform import distance_transform_edt
    from citlab_as_tpu.ops.swt_device import line_features_batch
    from citlab_as_tpu.stages.heading import (
        make_fused_heading_fn, make_fused_heading_swt_fn)
    from citlab_as_tpu.stages.separator import make_fused_separator_fn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def dir_or_none(d):
        d = os.path.join(repo, d)
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(B, H, W), dtype=np.uint8)
    batch = jnp.asarray(img)
    barrier(batch)

    out = {"shape": f"{B}x{H}x{W}"}

    sep_fused = make_fused_separator_fn(sep.model)
    timed("sep_fused(1500px)", lambda: sep_fused(
        sep.variables, batch, out_h=1500, out_w=1000, h_kernel=15,
        v_kernel=30, noise_kernel=10, threshold=0.05), out)

    head_fwd = make_fused_heading_fn(head.model)
    timed("head_forward_only(900px)", lambda: head_fwd(
        head.variables, batch, out_h=900, out_w=600), out)

    head_swt = make_fused_heading_swt_fn(head.model)
    timed("head_forward+fullres_EDT", lambda: head_swt(
        head.variables, batch, out_h=900, out_w=600), out)

    # EDT alone at full res (the SWT field), vmapped over the batch
    @jax.jit
    def edt_batch(u8):
        def one(im):
            inv = 255.0 - im.astype(jnp.float32)
            _, binary = otsu_binarize(inv, blur_ksize=5)
            return distance_transform_edt(binary, cap=255.0).astype(jnp.uint8)
        return jax.vmap(one)(u8)
    timed("otsu+EDT_batch(fullres)", lambda: edt_batch(batch), out)

    # per-line feature program at the production bucket: 64-line bucket,
    # swt crop [64, 512]; boxes ~ text lines (35 px tall, 200-500 px wide)
    prob_u8, dt_u8 = head_swt(head.variables, batch, out_h=900, out_w=600)
    barrier(dt_u8)
    L = 64
    n_real = 56
    sb = np.zeros((B, L, 4), np.int32)
    nb = np.zeros((B, L, 4), np.int32)
    for b in range(B):
        for i in range(n_real):
            w = int(rng.randint(180, 500))
            h = int(rng.randint(28, 44))
            x = int(rng.randint(0, W - w - 2))
            y = int(rng.randint(0, H - h - 2))
            sb[b, i] = (x, y, w, h)
            nb[b, i] = (int(x * 0.6), int(y * 0.6), int(w * 0.6), int(h * 0.6))
    sbj, nbj = jnp.asarray(sb), jnp.asarray(nb)
    barrier(sbj)

    timed("per_line_features(gather)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=64, crop_w=512, mxu=False), out)
    timed("per_line_features(gather2)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=64, crop_w=512, mxu=True), out)
    # production bucket after the 16-granular rounding (45-px lines -> 48)
    timed("per_line_features(gather,48)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=48, crop_w=512, mxu=False), out)
    timed("per_line_features(gather2,48)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=48, crop_w=512, mxu=True), out)
    # chunk-size A/B: fewer serial chunks = fewer while_loop syncs
    timed("per_line_features(gather2,48,c128)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=48, crop_w=512, mxu=True,
        chunk=128), out)
    timed("per_line_features(gather2,48,c512)", lambda: line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=48, crop_w=512, mxu=True,
        chunk=512), out)

    # separator post-processing alone (threshold -> CC filter -> morphology
    # -> pack) on a device-resident synthetic probability map
    from citlab_as_tpu.ops.connected_components import remove_small_components
    from citlab_as_tpu.stages.separator import (
        _separator_morphology_device, pack_bits_device)
    prob_map = jnp.asarray(
        (rng.rand(B, 1500, 1000) < 0.03).astype(np.float32) * 255.0)
    barrier(prob_map)

    @jax.jit
    def sep_post(binary):
        cleaned = jax.vmap(
            lambda b: remove_small_components(b, jnp.int32(100)))(binary)
        h, v = _separator_morphology_device(
            cleaned.astype(jnp.float32), 15, 30, 10)
        return jnp.stack([pack_bits_device(h > 0), pack_bits_device(v > 0)])
    timed("sep_post(CC+morph+pack)", lambda: sep_post(prob_map), out)

    @jax.jit
    def sep_cc(binary):
        return jax.vmap(
            lambda b: remove_small_components(b, jnp.int32(100)))(binary)
    timed("sep_CC_only", lambda: sep_cc(prob_map), out)

    # upload/readback costs over the tunnel
    t0 = time.perf_counter()
    up = jnp.asarray(img)
    barrier(up)
    out["upload_11MB"] = round((time.perf_counter() - t0) * 1000, 1)
    t0 = time.perf_counter()
    up2 = jax.device_put(img)
    barrier(up2)
    out["upload_11MB_device_put"] = round((time.perf_counter() - t0) * 1000, 1)
    one = img[:1]
    t0 = time.perf_counter()
    up3 = jax.device_put(one)
    barrier(up3)
    out["upload_1.5MB_device_put"] = round((time.perf_counter() - t0) * 1000, 1)
    masks = sep_fused(sep.variables, batch, out_h=1500, out_w=1000,
                      h_kernel=15, v_kernel=30, noise_kernel=10,
                      threshold=0.05)
    barrier(masks)
    t0 = time.perf_counter()
    _ = np.asarray(masks)
    out["readback_masks_2.6MB"] = round((time.perf_counter() - t0) * 1000, 1)

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
