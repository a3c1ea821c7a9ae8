"""Is the heading INVALID_ARGUMENT content-dependent or cumulative?

Runs the full workflow twice over the SAME warm pages (fresh out_dirs) and
prints live-buffer counts; a crash on run 2 with identical content implicates
sequence/resource state (e.g. remote buffer handles), not page content.
"""
import gc
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
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    gnn = RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1"))

    work = "/tmp/debug_second"
    shutil.rmtree(work, ignore_errors=True)
    rng = np.random.RandomState(0)

    for it in range(3):
        d = os.path.join(work, f"it{it}")
        os.makedirs(d)
        paths = [make_demo_page(d, f"w{i:03d}", rng)[0] for i in range(7)]
        # reuse rng state 0 content? no — fresh rng per iteration would be
        # same content; here rng advances, mirroring bench_ab's fresh pages
        print(f"run {it}: live arrays before = {len(jax.live_arrays())}",
              flush=True)
        run_full_workflow(paths, out_dir=os.path.join(d, "out"),
                          separator_predictor=sep, heading_predictor=head,
                          gnn_predictor=gnn, batch_size=7)
        gc.collect()
        print(f"run {it}: OK, live arrays after = {len(jax.live_arrays())}",
              flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
