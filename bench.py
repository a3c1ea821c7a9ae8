"""Benchmark: END-TO-END article-separation throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Primary metric (the driver-set north star is >= 50 pages/s end-to-end on a
v5e-8, i.e. 6.25 pages/s/chip): full-workflow pages/s on ONE chip over
realistic 1536x1024 synthetic newspaper pages — separator ARU-Net (fused
device pipeline), heading net + SWT fusion, DBSCAN baseline clustering,
text regions, GNN features, relation GNN + clustering, PAGE-XML IO.
vs_baseline = value / 6.25.

Extras: ARU-Net forward-only pages/s + MPix/s (the dominant-FLOPs kernel),
GNN edge predictions/s, and the per-stage breakdown.

Methodology notes: the workflow is warmed over the SAME page set first so
the timed run hits the per-batch-shape jit caches; device completion is
barriered by the host work that consumes each batch (file outputs), so the
e2e number is a true wall-clock rate. The forward benchmark cycles
pre-placed inputs and uses a device->host scalar read as the completion
barrier (block_until_ready returns immediately under the axon tunnel).
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.utils.compile_cache import enable as _enable_compile_cache
_enable_compile_cache()

H, W = 1536, 1024
BATCH = 7        # measured v5e sweet spot; XLA's conv schedule regresses B>=8
PAGES = 42       # six full batches: the 4-deep wave pipeline needs ~2 groups
                 # of fill before steady state (compile warm-up is separate)
NORTH_STAR_PER_CHIP = 50.0 / 8.0


def _make_predictors():
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor

    def dir_or_none(d):
        return d if os.path.isdir(d) else None

    return (SegmentationPredictor(dir_or_none("models_ckpt/separator")),
            SegmentationPredictor(dir_or_none("models_ckpt/heading")),
            RelationPredictor(dir_or_none("models_ckpt/gnn/best/f1")))


def _make_pages(work: str, n: int, seed: int = 0):
    from bench_e2e import make_demo_page
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    rng = np.random.RandomState(seed)
    return [make_demo_page(work, f"b{i:03d}", rng)[0] for i in range(n)]


def _driver():
    """Wave-pipelined by default (round-4 on-chip A/B: 6.41 pages/s
    pipelined vs 5.2 mid-round and 3.3-4.5 sequential — the pipelined
    driver is production shape AND bench default, closing round-3's
    weak #3). CITLAB_BENCH_DRIVER=sequential opts back out."""
    from citlab_as_tpu.cli import run_full_workflow as m
    from citlab_as_tpu.config import runtime
    if runtime.get("bench_driver") == "sequential":
        return m.run_full_workflow
    import functools
    return functools.partial(m.run_full_workflow_pipelined, force=True)


class HostLoadMonitor:
    """Samples 1-min load average + running-process count before and during
    the timed run so contention is machine-detectable in the BENCH JSON
    (round-4 weak #2: identical code read 9.16 vs 15.33 pages/s depending
    on host neighbours; 'quiet host' was tribal knowledge). The host is
    judged quiet when the peak load stays below ~1.5 on this 1-core box —
    i.e. nothing beyond the bench itself plus scheduler noise."""

    QUIET_LOAD = 1.5

    def __init__(self):
        self.samples = []
        self._stop = None
        self._thread = None

    @staticmethod
    def _sample():
        load1 = os.getloadavg()[0]
        try:
            with open("/proc/stat") as f:
                procs_running = next(
                    (int(line.split()[1]) for line in f
                     if line.startswith("procs_running")), -1)
        except OSError:
            procs_running = -1
        return {"load1": round(load1, 2), "procs_running": procs_running}

    def __enter__(self):
        import threading
        self.samples.append(self._sample())
        self._stop = threading.Event()

        def loop():
            while not self._stop.wait(5.0):
                self.samples.append(self._sample())

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=1.0)
        self.samples.append(self._sample())
        return False

    def report(self) -> dict:
        peak = max(s["load1"] for s in self.samples)
        quiet = peak < self.QUIET_LOAD
        if not quiet:
            print(f"bench: WARNING host contended during the timed run "
                  f"(peak load1={peak}, threshold {self.QUIET_LOAD}) — "
                  f"the number below may be depressed by neighbours",
                  file=sys.stderr, flush=True)
        return {"host_quiet": quiet, "load1_peak": peak,
                "load1_samples": [s["load1"] for s in self.samples],
                "procs_running_peak": max(s["procs_running"]
                                          for s in self.samples)}


# Reference seconds for the calibration workload below, measured on the
# round-5 bench host in its healthy phase (1-core 2.1 GHz Xeon, load1 < 0.1,
# the phase that produced the 22.55 pages/s record). host_speed_index =
# REF / measured: ~1.0 on a healthy host, < 1 when the CPU is in a slow
# phase. The same container measured 0.221 s and 0.383 s hours apart with
# zero steal and quiet load — the host's effective CPU speed varies ~1.7x
# over time, and the e2e wall is host-bound on 1 core, so pages/s tracks
# this index ~1:1 (14.15 pages/s during the 0.383 s phase, 22.55 during
# the 0.221 s phase, same code generation within a few host-tail commits).
HOST_SPEED_REF_S = 0.221


def host_speed_calibration(reps: int = 3) -> float:
    """Fixed host workload shaped like the pipeline's host tail (pure-Python
    loop + small-matrix numpy), best-of-``reps`` seconds. Detects a slower
    machine class / hypervisor throttling that the load-average guard cannot
    see (load was quiet both rounds; the CPU itself differed)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        rng = np.random.RandomState(0)
        a = rng.rand(256, 256)
        for _ in range(60):
            a = a @ a
            a /= np.abs(a).max() + 1.0
        best = min(best, time.perf_counter() - t0)
    return best


def bench_e2e():
    run_full_workflow = _driver()

    image_paths = _make_pages("/tmp/bench_repo_e2e", PAGES + BATCH)
    sep, head, gnn = _make_predictors()

    # warm on one batch-sized group: compiles every program (both fused
    # nets + GNN buckets). The timed run uses FRESH pages so per-page
    # caches (e.g. the SWT distance transform memo) cannot flatter the
    # number — every page is processed cold, as in production.
    run_full_workflow(
        image_paths[:BATCH], out_dir="/tmp/bench_repo_e2e/warm",
        separator_predictor=sep, heading_predictor=head,
        gnn_predictor=gnn, batch_size=BATCH)
    timed_pages = image_paths[BATCH:]
    timings = {}
    with HostLoadMonitor() as mon:
        t0 = time.perf_counter()
        run_full_workflow(
            timed_pages, out_dir="/tmp/bench_repo_e2e/out",
            separator_predictor=sep, heading_predictor=head,
            gnn_predictor=gnn, batch_size=BATCH, timings=timings)
        total = time.perf_counter() - t0
    stages = {k: round(v / PAGES, 3) for k, v in sorted(timings.items())}
    stages["total_s_per_page"] = round(total / PAGES, 3)
    return PAGES / total, stages, mon.report()


def bench_e2e_fresh_process(n_pages: int):
    """Relay-bug fallback (ROUND3_NOTES.md): one single workflow invocation
    over ``n_pages`` fresh pages in THIS (fresh) process — the axon relay's
    INVALID_ARGUMENT poison has only ever hit the SECOND in-process
    invocation. Program binaries come warm from the persistent compile
    cache, but their load/first-dispatch overhead lands inside the timed
    window (reported in the methodology note)."""
    run_full_workflow = _driver()

    image_paths = _make_pages("/tmp/bench_repo_e2e_fb", n_pages)
    sep, head, gnn = _make_predictors()
    timings = {}
    with HostLoadMonitor() as mon:
        t0 = time.perf_counter()
        run_full_workflow(
            image_paths, out_dir="/tmp/bench_repo_e2e_fb/out",
            separator_predictor=sep, heading_predictor=head,
            gnn_predictor=gnn, batch_size=BATCH, timings=timings)
        total = time.perf_counter() - t0
    stages = {k: round(v / n_pages, 3) for k, v in sorted(timings.items())}
    stages["total_s_per_page"] = round(total / n_pages, 3)
    return n_pages / total, stages, mon.report()


def bench_forward():
    from citlab_as_tpu.models.arunet import ARUNet

    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    inputs = [jax.device_put(jnp.asarray(
                  np.asarray(rng.rand(BATCH, H, W, 1), np.float32)
              ).astype(jnp.bfloat16)) for _ in range(2)]
    variables = model.init(jax.random.PRNGKey(0), inputs[0][:1])

    @jax.jit
    def forward(variables, image):
        logits, _ = model.apply(variables, image)
        return jax.nn.softmax(logits, axis=-1)

    def fetch_scalar(out):
        return float(np.asarray(out[0, 0, 0, 0]))

    for i in range(2):
        fetch_scalar(forward(variables, inputs[i % 2]))
    iters = 8
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = forward(variables, inputs[i % 2])
    fetch_scalar(out)
    dt = (time.perf_counter() - t0) / iters
    return BATCH / dt, BATCH / dt * H * W / 1e6


def bench_gnn(batch_graphs_n: int = 4, nodes: int = 128, iters: int = 10):
    from citlab_as_tpu.models.gnn.graph import (
        batch_graphs, build_full_relations, correct_edges, pad_graph)
    from citlab_as_tpu.models.gnn.model import GraphRelation
    from citlab_as_tpu.stages.features import delaunay_edges

    rng = np.random.RandomState(0)
    graphs = []
    for _ in range(batch_graphs_n):
        edges = delaunay_edges(nodes, rng.rand(nodes, 2) * 1000)
        efeat = rng.rand(len(edges), 2).astype(np.float32)
        edges, efeat = correct_edges(edges, efeat, nodes)
        rels, _, gts = build_full_relations(nodes, None)
        graphs.append(pad_graph(
            nodes, rng.rand(nodes, 15).astype(np.float32), edges, efeat,
            rels, gts, nodes, 1024, nodes * nodes))
    batch = jax.device_put(
        {k: jnp.asarray(v) for k, v in batch_graphs(graphs).items()})
    model = GraphRelation(num_classes=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(lambda v, b: jax.nn.softmax(model.apply(v, b), -1)[..., 1])
    float(np.asarray(fwd(variables, batch)[0, 0]))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(variables, batch)
    float(np.asarray(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    return batch_graphs_n * nodes * nodes / dt


def _emit(e2e_pages_s, stages, fwd_pages_s, mpix_s, edge_preds_s,
          methodology: str, n_pages: int, host: dict):
    from citlab_as_tpu.config import runtime
    print(json.dumps({
        "metric": f"end-to-end workflow pages/s ({n_pages} fresh 1536x1024 "
                  f"pages, all 5 stages, 1 chip)",
        "value": round(e2e_pages_s, 3),
        "unit": "pages/s",
        "vs_baseline": round(e2e_pages_s / NORTH_STAR_PER_CHIP, 3),
        "extra": {
            "methodology": methodology,
            "stage_s_per_page": stages,
            "arunet_forward_pages_per_s": round(fwd_pages_s, 1),
            "arunet_forward_MPix_per_s": round(mpix_s, 1),
            "gnn_edge_preds_per_s": round(edge_preds_s),
            "north_star_pages_per_s_per_chip": NORTH_STAR_PER_CHIP,
            "device": str(jax.devices()[0]),
            "runtime_switches": runtime.active(),
            "host_speed_calib_s": round(calib_s := host_speed_calibration(), 3),
            "host_speed_index": round(HOST_SPEED_REF_S / calib_s, 3),
            **host,
        },
    }), flush=True)


def _child(mode: str):
    """Fallback modes run in a fresh subprocess (see main)."""
    n = PAGES if mode == "--fallback-multi" else BATCH
    e2e_pages_s, stages, host = bench_e2e_fresh_process(n)
    fwd_pages_s, mpix_s = bench_forward()
    edge_preds_s = bench_gnn()
    _emit(e2e_pages_s, stages, fwd_pages_s, mpix_s, edge_preds_s,
          methodology=(
              "relay-bug fallback: single workflow invocation in a fresh "
              "process (persistent compile cache warm; executable "
              "load/first-dispatch overhead INCLUDED in the timed window)"),
          n_pages=n, host=host)


def _preflight(timeout_s: int = 240) -> None:
    """Fail FAST if the axon relay is down: PJRT client creation then hangs
    indefinitely inside make_c_api_client (ROUND3_NOTES.md — observed after
    a relay outage), which would wedge the driver's bench run rather than
    fail it. Probe device initialization in a subprocess with a timeout;
    client creation normally completes in seconds."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench: device initialization did not complete within "
            f"{timeout_s}s — axon relay down/wedged; aborting instead of "
            f"hanging")
    if r.returncode != 0:
        raise SystemExit(
            f"bench: device initialization failed (rc={r.returncode}): "
            f"{r.stderr.strip()[-500:]}")


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("--fallback"):
        _child(sys.argv[1])
        return
    _preflight()
    try:
        e2e_pages_s, stages, host = bench_e2e()
        fwd_pages_s, mpix_s = bench_forward()
        edge_preds_s = bench_gnn()
        _emit(e2e_pages_s, stages, fwd_pages_s, mpix_s, edge_preds_s,
              methodology="warm-up on a separate batch-shaped page set, "
                          "then timed run over fresh pages (cold per-page "
                          "caches) in the same process",
              n_pages=PAGES, host=host)
        return
    except Exception as e:  # axon relay INVALID_ARGUMENT poison: client is
        print(f"bench: in-process run failed ({type(e).__name__}: {e}); "
              f"falling back to fresh-process methodology", file=sys.stderr,
              flush=True)
    # wedged after the poison, so each fallback needs its own process
    import subprocess
    for mode in ("--fallback-multi", "--fallback-single"):
        r = subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                           timeout=3000)
        if r.returncode == 0:
            return
        print(f"bench: {mode} failed (rc={r.returncode})", file=sys.stderr,
              flush=True)
    raise SystemExit("bench: all methodologies failed")


if __name__ == "__main__":
    main()
