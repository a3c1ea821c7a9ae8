"""Relay soak (round-4 VERDICT #4): long pipelined run, pins disabled.

56 fresh pages (8 full 7-page groups), THREE pipelined workflow invocations
in one process, gather2 extraction, with ops.device_hold DISABLED
(CITLAB_HOLD_DEVICE_BUFFERS=0 set before jax initializes) — establishes
whether the round-3 buffer pins are still needed under the gather-mode
programs, and whether a long multi-invocation run re-hits the axon
second-drain INVALID_ARGUMENT.

Usage: python -u scripts/soak_relay.py [--pages 56] [--runs 3] [--hold]
Prints one JSON line with pass/fail + pages/s per run + peak RSS.
"""
import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=56)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--hold", action="store_true", default=False,
                        help="keep the device_hold pins enabled")
    args = parser.parse_args()

    if not args.hold:
        os.environ["CITLAB_HOLD_DEVICE_BUFFERS"] = "0"

    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import numpy as np
    import shutil

    from bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow_pipelined
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.ops.device_hold import held_count

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def dir_or_none(d):
        d = os.path.join(repo, d)
        return d if os.path.isdir(d) else None

    sep = SegmentationPredictor(dir_or_none("models_ckpt/separator"))
    head = SegmentationPredictor(dir_or_none("models_ckpt/heading"))
    gnn = RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1"))

    result = {"pages": args.pages, "runs": [], "hold_pins": args.hold,
              "extract": os.environ.get("CITLAB_SWT_EXTRACT", "gather2")}
    status = "PASS"
    try:
        for r in range(args.runs):
            work = f"/tmp/soak_relay/run{r}"
            shutil.rmtree(work, ignore_errors=True)
            os.makedirs(work)
            rng = np.random.RandomState(100 + r)
            paths = [make_demo_page(work, f"s{i:03d}", rng)[0]
                     for i in range(args.pages)]
            t0 = time.perf_counter()
            run_full_workflow_pipelined(
                paths, out_dir=f"{work}/out", separator_predictor=sep,
                heading_predictor=head, gnn_predictor=gnn, batch_size=7)
            dt = time.perf_counter() - t0
            result["runs"].append({
                "pages_s": round(args.pages / dt, 3),
                "held_buffers": held_count()})
            print(f"run {r}: {args.pages / dt:.2f} pages/s "
                  f"(held={held_count()})", flush=True)
    except Exception as e:  # noqa: BLE001 — report the poison, don't hide it
        status = f"FAIL: {type(e).__name__}: {e}"
    result["status"] = status
    result["peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
