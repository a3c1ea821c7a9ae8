"""Test barrier placements for the iter-1 heading wedge.

it0: normal (compile barriers implicit) — expect OK
it1: scalar-read barrier after the big fused dispatch — does it survive?
it2: no barrier — expect CRASH if the it1 barrier is the fix
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import numpy as np

BARRIER = {0: False, 1: True, 2: False}


def main():
    import jax.numpy as jnp
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

    work = "/tmp/debug_head_barrier"
    shutil.rmtree(work, ignore_errors=True)
    rng = np.random.RandomState(0)

    for it in range(3):
        d = os.path.join(work, f"it{it}")
        os.makedirs(d)
        paths = [make_demo_page(d, f"w{i:03d}", rng)[0] for i in range(7)]
        sp = SeparatorNetPostProcessor(paths, sep, fixed_height=1500)
        sp.run_batched(batch_size=7)
        page_paths = [get_page_path(p) + ".xml" for p in paths]
        proc = HeadingNetPostProcessor(paths, head, fixed_height=900,
                                       page_paths=page_paths, save_suffix="")
        groups = SeparatorNetPostProcessor.group_by_shape(paths, 7)
        pages_by_path = {}
        for images, chunk in groups:
            entry = proc.fused_dispatch(images, chunk, 7)
            if BARRIER[it]:
                _, maps_u8, dt_u8, _ = entry
                v1 = float(jnp.asarray(maps_u8[0, 0, 0]))
                v2 = float(jnp.asarray(dt_u8[0, 0, 0]))
                print(f"it{it}: barrier read maps={v1} dt={v2}", flush=True)
            proc.fused_drain(entry, pages_by_path)
        print(f"heading it{it}: OK (barrier={BARRIER[it]})", flush=True)


if __name__ == "__main__":
    main()
