"""Bisect: separator ONCE, heading stage looped 3x over the same pages.

If heading-only iterations crash on it1, the trigger is the heading stage
loop itself (real XML boxes / bucket growth); if all pass, the trigger is
the separator stage running in each iteration.
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

    work = "/tmp/debug_min3"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"w{i:03d}", rng)[0] for i in range(7)]

    sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
    sp.run_batched(batch_size=7)
    print("separator done (once)", flush=True)
    page_paths = [get_page_path(p) + ".xml" for p in paths]

    for it in range(3):
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        proc.run_batched(batch_size=7)
        print(f"heading it{it}: OK", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
