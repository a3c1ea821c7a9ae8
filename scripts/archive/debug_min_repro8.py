"""repro6 but with a NEW HeadingNetPostProcessor per iteration (fresh
DeviceLineFeatures, bucket regrowth) — classify/save still skipped.

crash @ it1 -> proc recreation is the trigger; pass -> classify/save is.
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
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.utils.io import get_page_path

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    work = "/tmp/debug_min8"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(src, work)
    paths = sorted(glob.glob(os.path.join(work, "*.png")))
    page_paths = [get_page_path(p) + ".xml" for p in paths]

    mdir = "models_ckpt/heading"
    head = SegmentationPredictor(mdir if os.path.isdir(mdir) else None)

    for it in range(3):
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
        for images, chunk in groups:
            entry = proc.fused_dispatch(list(images), list(chunk), 7)
            state = proc.fused_drain_dispatch(entry)
            kind, payload = state
            assert kind == "device"
            _pages, handle = payload
            res = handle()
            print(f"it{it}: OK ({len(res)} pages)", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/debug_min3")
