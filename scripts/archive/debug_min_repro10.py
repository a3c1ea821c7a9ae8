"""repro9 + the separator stage run ONCE at start (device residency).

crash @ it1 -> separator residency + real heading loop is the trigger set.
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

    work = "/tmp/debug_min10"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(src, work)
    paths = sorted(glob.glob(os.path.join(work, "*.png")))
    page_paths = [get_page_path(p) + ".xml" for p in paths]

    mdir = "models_ckpt/heading"
    head = SegmentationPredictor(mdir if os.path.isdir(mdir) else None)
    sdir = "models_ckpt/separator"
    sep = SegmentationPredictor(sdir if os.path.isdir(sdir) else None)
    sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
    sp.run_batched(batch_size=7)
    print("separator done (once)", flush=True)

    for it in range(3):
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
        for images, chunk in groups:
            entry = proc.fused_dispatch(list(images), list(chunk), 7)
            pages_by_path = {}
            proc.fused_drain(entry, pages_by_path)
            print(f"it{it}: OK ({len(pages_by_path)} pages)", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/debug_min3")
