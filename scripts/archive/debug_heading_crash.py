"""Localize the TPU INVALID_ARGUMENT in the workflow heading stage.

Replicates bench_ab's sequential warm-up (separator stage, then the fused
heading stage) but blocks after each device program so the failing
computation surfaces at its own dispatch instead of at the final readback.
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
    import jax
    from bench_e2e import make_demo_page
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.utils.io import get_page_path

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))

    work = "/tmp/debug_heading"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"w{i:03d}", rng)[0] for i in range(7)]

    sep_proc = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
    sep_proc.run_batched(batch_size=7)
    print("separator done", flush=True)

    page_paths = [get_page_path(p) + ".xml" for p in paths]
    proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                   page_paths=page_paths, save_suffix="")

    # replicate run_batched_fused with sync points
    groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
    for images, chunk in groups:
        entry = proc.fused_dispatch(images, chunk, 7)
        chunk_, maps_u8, dt_u8, orig = entry
        jax.block_until_ready(maps_u8)
        print("forward maps ok", maps_u8.shape, flush=True)
        jax.block_until_ready(dt_u8)
        print("forward dt ok", dt_u8.shape, flush=True)

        # now replicate fused_drain_dispatch with bucket prints + syncs
        from citlab_as_tpu.ops import swt_device as sd
        from citlab_as_tpu.stages.separator_writer import RegionToPageWriter
        feats = sd.DeviceLineFeatures()
        swt_list, net_list = [], []
        for image_path in chunk:
            pp = dict(zip(proc.image_paths, proc.page_paths))[image_path]
            writer = RegionToPageWriter(pp, path_to_image=image_path,
                                        fixed_height=900, scaling_factor=1.0)
            tls = writer.page_object.get_textlines()
            sb, nb = proc.line_feature_boxes(tls, writer.scaling_factor)
            swt_list.append(sb)
            net_list.append(nb)
            print(f"page {os.path.basename(pp)}: {len(tls)} lines, "
                  f"swt h max {sb[:,3].max(initial=0)} w max {sb[:,2].max(initial=0)}, "
                  f"net h max {nb[:,3].max(initial=0)} w max {nb[:,2].max(initial=0)}, "
                  f"mins {sb.min(initial=0)} {nb.min(initial=0)}", flush=True)

        sb_arr, svalids, counts = feats._sanitize(swt_list)
        nb_arr, _, _ = feats._sanitize(net_list)
        print("line bucket", feats._line_bucket, "counts", counts, flush=True)
        if nb_arr.shape[1] != sb_arr.shape[1]:
            pad = max(nb_arr.shape[1], sb_arr.shape[1])
            sb_arr = np.pad(sb_arr, ((0, 0), (0, pad - sb_arr.shape[1]), (0, 0)))
            nb_arr = np.pad(nb_arr, ((0, 0), (0, pad - nb_arr.shape[1]), (0, 0)))
        feats._swt_crop[0] = max(feats._swt_crop[0], sd._pow2(int(sb_arr[..., 3].max(initial=0)) + 1))
        feats._swt_crop[1] = max(feats._swt_crop[1], sd._pow2(int(sb_arr[..., 2].max(initial=0)) + 1))
        feats._net_crop[0] = max(feats._net_crop[0], sd._pow2(int(nb_arr[..., 3].max(initial=0))))
        feats._net_crop[1] = max(feats._net_crop[1], sd._pow2(int(nb_arr[..., 2].max(initial=0))))
        print("swt crop", feats._swt_crop, "net crop", feats._net_crop, flush=True)

        import jax.numpy as jnp
        b = len(counts)
        sums_dev = sd.net_prob_sums_batch(maps_u8[:b], jnp.asarray(nb_arr),
                                          crop_h=feats._net_crop[0],
                                          crop_w=feats._net_crop[1])
        jax.block_until_ready(sums_dev)
        print("net sums ok", np.asarray(sums_dev)[:, :3], flush=True)

        sw_th_dev = sd.swt_line_stats_batch(dt_u8[:b], jnp.asarray(sb_arr),
                                            crop_h=feats._swt_crop[0],
                                            crop_w=feats._swt_crop[1])
        jax.block_until_ready(sw_th_dev)
        print("swt stats ok", np.asarray(sw_th_dev)[0, :3], flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
