"""cProfile the host tail: baseline clustering, textregion, features.

Runs on CPU against pages produced by a previous debug run (post separator +
heading). Usage: python -u scripts/profile_host_tail.py /tmp/debug_min3
"""
import cProfile
import glob
import io
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")


def main(src):
    # work on a copy so reruns are reproducible
    work = "/tmp/profile_tail"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(src, work)
    page_paths = sorted(glob.glob(os.path.join(work, "page", "*.xml.xml")))
    image_paths = sorted(glob.glob(os.path.join(work, "*.png")))
    n = len(page_paths)
    print(f"{n} pages", flush=True)

    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    for name, fn in [
        ("baselines", lambda: [cluster_page(p) for p in page_paths]),
        ("textregion", lambda: [generate_text_regions_for_page(p)
                                for p in page_paths]),
        ("features", lambda: generate_feature_jsons(
            page_paths, visual_regions=False, separators="bb",
            image_paths=image_paths)),
    ]:
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        fn()
        pr.disable()
        dt = time.perf_counter() - t0
        print(f"\n=== {name}: {dt:.3f}s total, {dt/n*1e3:.1f} ms/page ===",
              flush=True)
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
        print("\n".join(s.getvalue().splitlines()[4:40]), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/debug_min3")
