"""On-chip per-part profile of the wave-pipelined driver.

Warm (compile) on one batch group, then a timed run over fresh pages,
printing each pipeline part's per-page cost. The 'separator_materialize'
part is the pipeline's single device barrier — it measures how long the
host WAITS on the device; every other part is pure host (or dispatch)
work that should overlap device compute.

Usage: python -u scripts/profile_pipelined.py [--sequential]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 7
PAGES = 14


def main():
    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import numpy as np
    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import (
        run_full_workflow, run_full_workflow_pipelined)
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    sequential = "--sequential" in sys.argv
    work = "/tmp/profile_pipelined"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"b{i:03d}", rng)[0]
             for i in range(PAGES + BATCH)]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def dir_or_none(d):
        d = os.path.join(repo, d)
        return d if os.path.isdir(d) else None
    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    gnn = RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1"))

    fn = run_full_workflow if sequential else run_full_workflow_pipelined

    def run(pp, out, timings):
        t0 = time.perf_counter()
        fn(pp, out_dir=out, separator_predictor=sep, heading_predictor=head,
           gnn_predictor=gnn, batch_size=BATCH, timings=timings)
        return time.perf_counter() - t0

    run(paths[:BATCH], f"{work}/warm", {})
    timings = {}
    dt = run(paths[BATCH:], f"{work}/out", timings)
    per_page = {k: round(v / PAGES * 1000, 1) for k, v in sorted(
        timings.items(), key=lambda kv: -kv[1]) if k != "total"}
    print(json.dumps({
        "driver": "sequential" if sequential else "pipelined",
        "pages_s": round(PAGES / dt, 3),
        "total_ms_per_page": round(dt / PAGES * 1000, 1),
        "part_ms_per_page": per_page,
        "sum_parts_ms": round(sum(v for k, v in timings.items()
                                  if k != "total") / PAGES * 1000, 1),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
