"""repro10 with a step-by-step it1: barrier after EVERY device action.

it0 runs the normal fused_drain (real classify+save). it1 replays the drain
manually — upload boxes, slice, run sw program, BARRIER, run sums program,
BARRIER, full readbacks — so the first failing step identifies the poisoned
op instead of surfacing at the final materialize.
"""
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import numpy as np


def main(src):
    import jax.numpy as jnp
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.ops import swt_device as sd
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.stages.separator_writer import RegionToPageWriter
    from citlab_as_tpu.utils.io import get_page_path

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    work = "/tmp/debug_min12"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(src, work)
    paths = sorted(glob.glob(os.path.join(work, "*.png")))
    page_paths = [get_page_path(p) + ".xml" for p in paths]

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
    sp.run_batched(batch_size=7)
    print("separator done (once)", flush=True)

    for it in range(3):
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
        for images, chunk in groups:
            entry = proc.fused_dispatch(list(images), list(chunk), 7)
            if it == 0:
                pages_by_path = {}
                proc.fused_drain(entry, pages_by_path)
                print(f"it{it}: OK (normal drain)", flush=True)
                continue

            # ---- step-by-step drain with barriers
            _, maps_u8, dt_u8, _ = entry
            v = float(jnp.asarray(maps_u8[0, 0, 0]))
            print(f"it{it}: barrier maps ok ({v})", flush=True)
            v = float(jnp.asarray(dt_u8[0, 0, 0]))
            print(f"it{it}: barrier dt ok ({v})", flush=True)

            feats = sd.DeviceLineFeatures()
            swt_list, net_list = [], []
            for image_path in chunk:
                pp = proc._page_path_for(image_path)
                writer = RegionToPageWriter(pp, path_to_image=image_path,
                                            fixed_height=900,
                                            scaling_factor=1.0)
                tls = writer.page_object.get_textlines()
                sb_, nb_ = proc.line_feature_boxes(tls, writer.scaling_factor)
                swt_list.append(sb_)
                net_list.append(nb_)
            sb, svalids, counts = feats._sanitize(swt_list)
            nb, _, _ = feats._sanitize(net_list)
            if nb.shape[1] != sb.shape[1]:
                pad = max(nb.shape[1], sb.shape[1])
                sb = np.pad(sb, ((0, 0), (0, pad - sb.shape[1]), (0, 0)))
                nb = np.pad(nb, ((0, 0), (0, pad - nb.shape[1]), (0, 0)))
            feats._swt_crop[0] = max(feats._swt_crop[0],
                                     sd._pow2(int(sb[..., 3].max()) + 1))
            feats._swt_crop[1] = max(feats._swt_crop[1],
                                     sd._pow2(int(sb[..., 2].max()) + 1))
            feats._net_crop[0] = max(feats._net_crop[0],
                                     sd._pow2(int(nb[..., 3].max())))
            feats._net_crop[1] = max(feats._net_crop[1],
                                     sd._pow2(int(nb[..., 2].max())))
            print(f"it{it}: buckets swt={feats._swt_crop} "
                  f"net={feats._net_crop} lb={sb.shape[1]}", flush=True)

            b = len(counts)
            sb_dev = jnp.asarray(sb)
            v = int(jnp.asarray(sb_dev[0, 0, 0]))
            print(f"it{it}: barrier sb upload ok ({v})", flush=True)
            nb_dev = jnp.asarray(nb)
            v = int(jnp.asarray(nb_dev[0, 0, 0]))
            print(f"it{it}: barrier nb upload ok ({v})", flush=True)

            dt_s = dt_u8[:b]
            v = float(jnp.asarray(dt_s[0, 0, 0]))
            print(f"it{it}: barrier dt slice ok ({v})", flush=True)
            prob_s = maps_u8[:b]
            v = float(jnp.asarray(prob_s[0, 0, 0]))
            print(f"it{it}: barrier prob slice ok ({v})", flush=True)

            sw = sd.swt_line_stats_batch(dt_s, sb_dev,
                                         crop_h=feats._swt_crop[0],
                                         crop_w=feats._swt_crop[1])
            v = float(jnp.asarray(sw[0, 0, 0]))
            print(f"it{it}: barrier sw program ok ({v})", flush=True)

            sums = sd.net_prob_sums_batch(prob_s, nb_dev,
                                          crop_h=feats._net_crop[0],
                                          crop_w=feats._net_crop[1])
            v = int(jnp.asarray(sums[0, 0]))
            print(f"it{it}: barrier sums program ok ({v})", flush=True)

            s_np = np.asarray(sums, np.float64)
            w_np = np.array(sw)
            print(f"it{it}: OK full readbacks ({s_np.shape}, {w_np.shape})",
                  flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/debug_min3")
