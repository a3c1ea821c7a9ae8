"""Minimal repro: run ONLY the heading fused stage twice in one process.

Run 1 of the full workflow crashes at the heading drain's sums materialize;
this isolates whether heading alone reproduces it, and on crash probes each
device buffer (maps, dt, sw_th, sums) separately to find which program is
poisoned.
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    from bench_e2e import make_demo_page
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.utils.io import get_page_path

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))

    work = "/tmp/debug_head_iter"
    shutil.rmtree(work, ignore_errors=True)

    for it in range(3):
        rng = np.random.RandomState(0)   # IDENTICAL content every iteration
        d = os.path.join(work, f"it{it}")
        os.makedirs(d)
        paths = [make_demo_page(d, f"w{i:03d}", rng)[0] for i in range(7)]
        # heading needs the separator stage's .xml.xml output files
        sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
        sp.run_batched(batch_size=7)
        page_paths = [get_page_path(p) + ".xml" for p in paths]
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        try:
            proc.run_batched(batch_size=7)
            print(f"heading it{it}: OK", flush=True)
        except Exception as e:
            print(f"heading it{it}: CRASH {type(e).__name__}: {e}",
                  flush=True)
            probe(proc, paths)
            raise


def probe(proc, paths):
    """Re-dispatch the fused program and probe each output separately."""
    import jax.numpy as jnp
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
    images, chunk = next(iter(groups))
    entry = proc.fused_dispatch(images, chunk, 7)
    _, maps_u8, dt_u8, _ = entry
    for name, buf in [("maps", maps_u8), ("dt", dt_u8)]:
        try:
            v = float(jnp.asarray(buf).reshape(-1)[0])
            print(f"probe {name}: ok ({v})", flush=True)
        except Exception as e:
            print(f"probe {name}: FAIL {type(e).__name__}: {e}", flush=True)
    # replicate fused_drain_dispatch's box assembly, then probe the two
    # per-line programs SEPARATELY (sw_th first, then sums)
    from citlab_as_tpu.ops.swt_device import (net_prob_sums_batch,
                                              swt_line_stats_batch)
    from citlab_as_tpu.stages.separator_writer import RegionToPageWriter
    import numpy as np

    feats = proc._device_features
    swt_list, net_list = [], []
    for image_path in chunk:
        page_path = proc._page_path_for(image_path)
        writer = RegionToPageWriter(page_path, path_to_image=image_path,
                                    fixed_height=proc.fixed_height,
                                    scaling_factor=proc.scaling_factor)
        sb, nb = proc.line_feature_boxes(writer.page_object.get_textlines(),
                                         writer.scaling_factor)
        swt_list.append(sb)
        net_list.append(nb)
    print("counts:", [len(b) for b in swt_list],
          "buckets:", feats._line_bucket, feats._swt_crop, feats._net_crop,
          flush=True)
    sb, _, _ = feats._sanitize(swt_list)
    nb, _, _ = feats._sanitize(net_list)
    if nb.shape[1] != sb.shape[1]:
        pad = max(nb.shape[1], sb.shape[1])
        sb = np.pad(sb, ((0, 0), (0, pad - sb.shape[1]), (0, 0)))
        nb = np.pad(nb, ((0, 0), (0, pad - nb.shape[1]), (0, 0)))
    b = len(chunk)
    try:
        sw = swt_line_stats_batch(dt_u8[:b], jnp.asarray(sb),
                                  crop_h=feats._swt_crop[0],
                                  crop_w=feats._swt_crop[1])
        print("sw_th: ok", np.asarray(sw).shape, flush=True)
    except Exception as e:
        print(f"sw_th: FAIL {type(e).__name__}: {e}", flush=True)
    try:
        sums = net_prob_sums_batch(maps_u8[:b], jnp.asarray(nb),
                                   crop_h=feats._net_crop[0],
                                   crop_w=feats._net_crop[1])
        print("sums: ok", np.asarray(sums).shape, flush=True)
    except Exception as e:
        print(f"sums: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
