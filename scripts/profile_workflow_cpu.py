"""cProfile the FULL workflow on the CPU backend (relay-down profiling).

Device timings are not representative on CPU, but the host tail (PAGE-XML
IO, geometry, contour/writer work, feature assembly, clustering) is the
same code the chip run executes between dispatches — this finds its
hotspots. Uses the same fresh-page methodology as bench.py: warm run over
one batch, timed+profiled run over fresh pages.

Usage: python -u scripts/profile_workflow_cpu.py [n_pages] [top]
"""
import cProfile
import os
import pstats
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    batch = 7

    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    work = "/tmp/profile_workflow_cpu"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"p{i:03d}", rng)[0]
             for i in range(n_pages + batch)]

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    gnn = RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1"))

    run_full_workflow(paths[:batch], out_dir=os.path.join(work, "warm"),
                      separator_predictor=sep, heading_predictor=head,
                      gnn_predictor=gnn, batch_size=batch)

    timings = {}
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    run_full_workflow(paths[batch:], out_dir=os.path.join(work, "out"),
                      separator_predictor=sep, heading_predictor=head,
                      gnn_predictor=gnn, batch_size=batch, timings=timings)
    pr.disable()
    total = time.perf_counter() - t0

    print(f"\n=== total {total:.2f}s over {n_pages} fresh pages "
          f"({total / n_pages * 1e3:.0f} ms/page) ===")
    for k, v in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / n_pages * 1e3:7.1f} ms/page")
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(top)
    print("\n--- by tottime ---")
    st.sort_stats("tottime").print_stats(top)


if __name__ == "__main__":
    main()
