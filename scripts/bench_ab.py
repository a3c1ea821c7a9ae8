"""On-chip A/B: sequential vs wave-pipelined workflow driver.

Same methodology as bench.py (trained checkpoints, warm-up on a separate
batch-shaped page set so per-page caches stay cold for the timed run, fresh
pages per driver), printing pages/s + per-stage breakdown for BOTH drivers.

    python -u scripts/bench_ab.py [--pages 14] [--batch 7]
"""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
enable_compile_cache()

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=14)
    parser.add_argument("--batch", type=int, default=7)
    parser.add_argument("--work_dir", type=str, default="/tmp/bench_ab")
    args = parser.parse_args()

    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import (
        run_full_workflow, run_full_workflow_pipelined)
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    gnn = RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1"))

    shutil.rmtree(args.work_dir, ignore_errors=True)
    os.makedirs(args.work_dir)
    rng = np.random.RandomState(0)

    def pages(tag, n):
        d = os.path.join(args.work_dir, tag)
        os.makedirs(d, exist_ok=True)
        return [make_demo_page(d, f"{tag}{i:03d}", rng)[0] for i in range(n)]

    warm = pages("warm", args.batch)
    for name, fn in (("sequential", run_full_workflow),
                     ("pipelined", run_full_workflow_pipelined)):
        # each driver warms its own programs and times its own fresh pages
        fn(warm, out_dir=os.path.join(args.work_dir, f"warm_out_{name}"),
           separator_predictor=sep, heading_predictor=head,
           gnn_predictor=gnn, batch_size=args.batch)
        timed = pages(f"t{name[:3]}", args.pages)
        timings = {}
        t0 = time.perf_counter()
        fn(timed, out_dir=os.path.join(args.work_dir, f"out_{name}"),
           separator_predictor=sep, heading_predictor=head,
           gnn_predictor=gnn, batch_size=args.batch, timings=timings)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "driver": name,
            "pages_per_s": round(args.pages / dt, 3),
            "s_per_page": round(dt / args.pages, 4),
            "stage_s_per_page": {k: round(v / args.pages, 4)
                                 for k, v in sorted(timings.items())},
        }), flush=True)


if __name__ == "__main__":
    main()
