"""Per-PART device times inside the heading per-line feature program.

The per-line program (ops/swt_device.line_features_batch) is the biggest
device slab left in the wave pipeline (~321 ms/group after the round-4
session-1 cuts). This probe breaks it into its stages at production shapes
on REALISTIC text-like pages (the bench demo-page stroke pattern — the
older probe_device_times.py uses random noise, which Otsu-binarizes into
percolating components and drives the CC fixpoint to worst-case iteration
counts):

  extract_only   row gather + one-hot MXU column matmul
  fixpoint_only  component_stats_u16 (the 4-channel u16 CC fixpoint)
  +bbox_max      ... plus the rect-max column sweep + 1-channel fixpoint
  stats_full     _line_stats_from_crops (adds the median binary search)
  full_program   line_features_batch (adds SAT net-prob sums + packing)

Usage: python -u scripts/probe_swt_parts.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3
B, H, W = 7, 1536, 1024
L = 64           # line bucket
CROP_H, CROP_W = 48, 512
CHUNK = 64


def barrier(x):
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf.ravel()[0])


def timed(name, fn, out):
    barrier(fn())
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        barrier(fn())
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best * 1000, 1)
    print(f"{name}: {out[name]} ms", flush=True)


def make_text_page(rng, h=H, w=W):
    """Demo-page-like strokes: 6x24 px verticals every 22 px, 2-3 columns."""
    import numpy as np
    n_cols = rng.randint(2, 4)
    col_w = w // n_cols
    img = np.full((h, w), 255, np.uint8)
    for c in range(1, n_cols):
        x = c * col_w
        img[40:h - 40, x - 2:x + 2] = 40
    boxes = []
    for c in range(n_cols):
        x0, x1 = c * col_w + 30, (c + 1) * col_w - 30
        y = 80
        while y < h - 60:
            for x in range(x0, x1 - 8, 22):
                img[y - 26:y - 2, x:x + 6] = 0
            boxes.append((x0, y - 30, x1 - x0, 34))
            y += int(rng.uniform(55, 75))
    return img, boxes


def main():
    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.stages.heading import make_fused_heading_swt_fn
    from citlab_as_tpu.ops import swt_device as sd

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def dir_or_none(d):
        d = os.path.join(repo, d)
        return d if os.path.isdir(d) else None

    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    print("predictor loaded", flush=True)

    rng = np.random.RandomState(0)
    imgs, all_boxes = [], []
    for _ in range(B):
        im, bx = make_text_page(rng)
        imgs.append(im)
        all_boxes.append(bx)
    batch = jnp.asarray(np.stack(imgs))
    barrier(batch)

    head_swt = make_fused_heading_swt_fn(head.model)
    print("dispatch head_swt", flush=True)
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
    n_lines = sum(len(b) for b in all_boxes)
    out = {"shape": f"{B}x{H}x{W}", "lines": n_lines,
           "bucket": f"{L}l {CROP_H}x{CROP_W} chunk{CHUNK}"}

    # --- the full program (reference point)
    timed("full_program", lambda: sd.line_features_batch(
        dt_u8, prob_u8, sbj, nbj, crop_h=CROP_H, crop_w=CROP_W, mxu=True),
        out)

    # --- extraction only: same row-take + einsum chunks, returns sums
    @partial(jax.jit, static_argnames=("crop_h", "crop_w", "chunk"))
    def extract_only(dt, boxes, crop_h, crop_w, chunk):
        b, l = boxes.shape[:2]
        h, w = dt.shape[1:]
        padded = jnp.pad(dt.astype(jnp.int32),
                         ((0, 0), (0, crop_h), (0, crop_w)))
        hp, wp = h + crop_h, w + crop_w
        flat_rows = padded.reshape(b * hp, wp)
        bf = boxes.reshape(b * l, 4)
        pages = jnp.arange(b * l, dtype=jnp.int32) // l
        ch_iota = jnp.arange(crop_h, dtype=jnp.int32)
        x_iota = jnp.arange(wp, dtype=jnp.int32)
        j_iota = jnp.arange(crop_w, dtype=jnp.int32)
        acc = []
        for s in range(0, chunk, chunk):
            eb = bf[s:s + chunk]
            pg = pages[s:s + chunk]
            row_idx = pg[:, None] * hp + eb[:, 1][:, None] + ch_iota[None, :]
            rows = jnp.take(flat_rows, row_idx.reshape(-1),
                            axis=0).reshape(chunk, crop_h, wp)
            onehot = (x_iota[None, :, None]
                      == (eb[:, 0][:, None, None] + j_iota[None, None, :]))
            crops = jnp.einsum(
                "nhx,nxj->nhj", rows.astype(jnp.bfloat16),
                onehot.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            acc.append(jnp.sum(crops, axis=(1, 2)))
        return jnp.concatenate(acc)
    timed("chunk_extract_only", lambda: extract_only(
        dt_u8, sbj, crop_h=CROP_H, crop_w=CROP_W, chunk=CHUNK), out)

    # --- pre-placed crops for the per-stage timings (extraction excluded)
    crops_np = np.zeros((B * L, CROP_H, CROP_W), np.int32)
    dt_host = np.asarray(dt_u8)
    for b in range(B):
        for i in range(L):
            x, y, w, h = sb[b, i]
            c = dt_host[b, y:y + h + 1, x:x + w + 1]
            crops_np[b * L + i, :c.shape[0], :c.shape[1]] = c
    crops_dev = jnp.asarray(crops_np)
    barrier(crops_dev)

    # ONE chunk per program (compiles over the tunnel cost ~2 min per NEW
    # program and scale with HLO size; one chunk is 1/7 of the program and
    # the per-chunk cost scales linearly — multiply by n_chunks to compare)
    chunk0 = crops_dev[:CHUNK]
    barrier(chunk0)
    print("timing single-chunk parts (x7 = group)", flush=True)

    @jax.jit
    def fixpoint_only(c):
        lab, mxx, mnx, mxy = sd.component_stats_u16(c, c > 0)
        return jnp.sum(lab, axis=(1, 2))
    timed("chunk_fixpoint", lambda: fixpoint_only(chunk0), out)

    @jax.jit
    def fixpoint_bbox(c):
        fg = c > 0
        lab, mxx, mnx, mxy = sd.component_stats_u16(c, fg)
        mny = lab // c.shape[-1]
        mdt = sd._bbox_max(c, fg, mny, mxy)
        return jnp.sum(mdt, axis=(1, 2))
    timed("chunk_fixpoint_bbox", lambda: fixpoint_bbox(chunk0), out)

    @jax.jit
    def stats_full(c):
        return sd._line_stats_from_crops(c, 2)
    timed("chunk_stats_full", lambda: stats_full(chunk0), out)

    # SAT net-prob sums alone
    timed("net_prob_SAT", lambda: sd.net_prob_sums_batch_sat(prob_u8, nbj),
          out)

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
