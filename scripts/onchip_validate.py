"""On-chip validation for the round-3 gather/SAT reformulation.

Run as soon as the axon relay is back (ROUND3_NOTES.md: outage 2026-08-17).
Sequence:

1. fast tunnel probe (subprocess, 240 s timeout — client creation hangs
   forever when the relay is down);
2. the previously-crashing scenario: full workflow TWICE in-process
   (warm + timed, fresh pages) with the default gather extraction — the
   lax.map chain's second cached execution used to poison the client;
3. if (2) survives, an A/B of CITLAB_SWT_EXTRACT=map in a fresh process
   (expected: crash or slower — evidence for the writeup either way);
4. sequential vs wave-pipelined driver A/B on the timed pages.

Usage: python -u scripts/onchip_validate.py [--skip-map-ab]
Each phase prints one line; the summary is JSON on the last line.
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 7
PAGES = 14


def probe(timeout_s=240) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_workflow(paths, out_dir, preds, pipelined=False):
    from citlab_as_tpu.cli.run_full_workflow import (
        run_full_workflow, run_full_workflow_pipelined)
    sep, head, gnn = preds
    timings = {}
    t0 = time.perf_counter()
    fn = run_full_workflow_pipelined if pipelined else run_full_workflow
    fn(paths, out_dir=out_dir, separator_predictor=sep,
       heading_predictor=head, gnn_predictor=gnn, batch_size=BATCH,
       timings=timings)
    return time.perf_counter() - t0, timings


def main():
    if not probe():
        print("tunnel DOWN (probe timed out) — nothing to validate")
        raise SystemExit(2)
    print("tunnel UP", flush=True)

    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import numpy as np
    from bench_e2e import make_demo_page
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    work = "/tmp/onchip_validate"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(0)
    paths = [make_demo_page(work, f"b{i:03d}", rng)[0]
             for i in range(PAGES + BATCH)]

    def dir_or_none(d):
        return d if os.path.isdir(d) else None
    preds = (SegmentationPredictor(dir_or_none("models_ckpt/separator")),
             SegmentationPredictor(dir_or_none("models_ckpt/heading")),
             RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1")))

    summary = {"extract_mode": os.environ.get("CITLAB_SWT_EXTRACT", "gather")}

    # phase 2: warm + timed in ONE process (the old crasher)
    print("phase 2: warm run (compiles)...", flush=True)
    dt, _ = run_workflow(paths[:BATCH], f"{work}/warm", preds)
    print(f"warm ok ({dt:.1f}s)", flush=True)
    print("phase 2: timed second in-process run (old crash point)...",
          flush=True)
    dt, timings = run_workflow(paths[BATCH:], f"{work}/seq", preds)
    summary["sequential_pages_s"] = round(PAGES / dt, 3)
    summary["sequential_stage_s_per_page"] = {
        k: round(v / PAGES, 3) for k, v in sorted(timings.items())}
    print(f"SECOND IN-PROCESS RUN SURVIVED: {PAGES/dt:.2f} pages/s "
          f"{summary['sequential_stage_s_per_page']}", flush=True)

    # phase 4: pipelined A/B (same process, third run — also a survival test)
    print("phase 4: wave-pipelined A/B...", flush=True)
    try:
        dt, timings = run_workflow(paths[BATCH:], f"{work}/pipe", preds,
                                   pipelined=True)
        summary["pipelined_pages_s"] = round(PAGES / dt, 3)
        print(f"pipelined: {PAGES/dt:.2f} pages/s", flush=True)
    except Exception as e:
        summary["pipelined_error"] = f"{type(e).__name__}: {e}"
        print(f"pipelined FAILED: {e}", flush=True)

    print(json.dumps(summary), flush=True)

    # phase 3: legacy map-mode A/B in a fresh process (may crash — that is
    # the expected evidence; run LAST so it cannot poison the numbers above)
    if "--skip-map-ab" not in sys.argv:
        for child_mode in ("gather2", "map"):
            print(f"phase 3: CITLAB_SWT_EXTRACT={child_mode} A/B "
                  f"(fresh process)...", flush=True)
            env = dict(os.environ, CITLAB_SWT_EXTRACT=child_mode)
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--skip-map-ab"], env=env, timeout=3600)
            print(f"{child_mode} child rc={r.returncode} "
                  f"(for map: nonzero/crash = relay bug still live)",
                  flush=True)


if __name__ == "__main__":
    main()
