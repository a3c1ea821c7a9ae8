"""Replay the REAL heading fused path in a tight loop on existing pages.

Uses the pages from a previous run (post separator), calling the stage's own
fused_dispatch / fused_drain_dispatch / materialize — but skipping
classification + XML save. If it1 crashes, the trigger is fully contained in
the dispatch/drain path (real images + real boxes); if not, it's in
classify/save.

Usage: python -u scripts/debug_min_repro6.py [src_dir=/tmp/debug_min3]
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

    work = "/tmp/debug_min6"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(src, work)
    paths = sorted(glob.glob(os.path.join(work, "*.png")))
    page_paths = [get_page_path(p) + ".xml" for p in paths]

    mdir = "models_ckpt/heading"
    head = SegmentationPredictor(mdir if os.path.isdir(mdir) else None)

    proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                   page_paths=page_paths, save_suffix="")
    groups = list(SeparatorNetPostProcessor.group_by_shape(paths, 7))
    images, chunk = groups[0]
    import time
    for it in range(3):
        if it:
            t0 = time.time()
            while time.time() - t0 < 4.0:
                pass  # busy host work
            time.sleep(6.0)
        entry = proc.fused_dispatch(list(images), list(chunk), 7)
        state = proc.fused_drain_dispatch(entry)
        kind, payload = state
        if kind == "device":
            _pages, handle = payload
            res = handle()
            print(f"it{it}: OK ({len(res)} pages, "
                  f"netp0={res[0][0][:2]}, swth0={res[0][1][0]})", flush=True)
        else:
            print(f"it{it}: host path?!", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/debug_min3")
