"""Full article-separation workflow driver.

Runs the five pipeline stages in sequence over an image list (the
reference's README workflow: separator detection -> heading detection ->
baseline clustering -> text region generation -> GNN features -> GNN
clustering), preserving each stage's file contract. Models may be absent
(random-init predictors) which exercises the full path without trained
weights — useful for benchmarking plumbing and for smoke tests.
"""
from __future__ import annotations

import argparse
import logging
import os
import time
from typing import Optional, Sequence

from citlab_as_tpu.utils.io import get_page_path, load_list_file

logger = logging.getLogger(__name__)


def _align_feature_jsons(json_paths, page_paths, image_paths):
    """generate_feature_jsons SKIPS pages without enough text regions, so
    its return list is not 1:1 with ``page_paths``. JSONs are named after
    the page file — match them back by basename and return aligned
    (json, page, image) triples for the pages that survived."""
    by_name = {os.path.splitext(os.path.basename(j))[0]: j
               for j in json_paths}
    out = []
    for pp, ip in zip(page_paths, image_paths):
        key = os.path.splitext(os.path.basename(pp))[0]
        if key in by_name:
            out.append((by_name[key], pp, ip))
    return out


def run_full_workflow(image_paths: Sequence[str],
                      separator_model_dir: Optional[str] = None,
                      heading_model_dir: Optional[str] = None,
                      gnn_model_dir: Optional[str] = None,
                      clustering_method: str = "dbscan",
                      out_dir: str = "",
                      skip_heading: bool = False,
                      skip_gnn: bool = False,
                      timings: Optional[dict] = None,
                      separator_predictor=None,
                      heading_predictor=None,
                      gnn_predictor=None,
                      batch_size: int = 7,
                      separator_fixed_height: int = 1500,
                      heading_fixed_height: int = 900,
                      heading_device_swt: Optional[bool] = None) -> dict:
    """Returns {'pages': [...], 'timings': {stage: seconds}}. Predictors may
    be injected directly (tests / custom models); otherwise they are loaded
    from the given model dirs (random-init when None).
    ``heading_device_swt`` overrides the heading stage's device-SWT
    autodetection (None = on for accelerator backends)."""
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.gnn_io import gnn_clustering_for_pages
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    timings = timings if timings is not None else {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = timings.get(name, 0.0) + time.time() - t0
        logger.info("stage %s: %.2fs", name, timings[name])
        return out

    # 1. separator detection (batched + dispatch-ahead when multi-page)
    sep_predictor = separator_predictor or SegmentationPredictor(separator_model_dir)
    sep_proc = SeparatorNetPostProcessor(
        list(image_paths), sep_predictor,
        fixed_height=separator_fixed_height)
    if len(image_paths) > 1 and hasattr(sep_predictor, "predict_batch"):
        timed("separator", lambda: sep_proc.run_batched(batch_size=batch_size))
    else:
        timed("separator", sep_proc.run)

    # The separator stage writes <page>.xml.xml; subsequent stages read those
    page_paths = [get_page_path(p) + ".xml" for p in image_paths]

    from citlab_as_tpu.pagexml.page import page_cache
    with page_cache():
        return _run_post_separator_stages(
            image_paths, page_paths, heading_model_dir, gnn_model_dir,
            clustering_method, out_dir, skip_heading, skip_gnn, timings,
            timed, heading_predictor, gnn_predictor, batch_size,
            heading_fixed_height, heading_device_swt)


def _run_post_separator_stages(image_paths, page_paths, heading_model_dir,
                               gnn_model_dir, clustering_method, out_dir,
                               skip_heading, skip_gnn, timings, timed,
                               heading_predictor, gnn_predictor, batch_size,
                               heading_fixed_height,
                               heading_device_swt=None):
    """Stages 2-5 of :func:`run_full_workflow`, run inside a page_cache()
    scope: each stage re-reads the page file the previous stage just wrote,
    so the scoped parse memo removes one DOM parse per stage per page
    (files are still written — the on-disk contract is unchanged)."""
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.gnn_io import gnn_clustering_for_pages
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    # 2. heading detection, chained onto the separator-stage output pages
    # (updated in place via page_paths + empty save_suffix); batched +
    # dispatch-ahead, fused device path on accelerator backends
    heading_line_features = None
    if not skip_heading:
        heading_predictor = heading_predictor or SegmentationPredictor(heading_model_dir)
        proc = HeadingNetPostProcessor(
            list(image_paths), heading_predictor,
            fixed_height=heading_fixed_height,
            page_paths=page_paths, save_suffix="")
        proc.use_device_swt = heading_device_swt
        timed("heading", lambda: proc.run_batched(batch_size=batch_size)
              if len(image_paths) > 1 else proc.run())
        heading_line_features = proc.line_features_by_page

    # 3. baseline clustering + 4. text regions
    def run_clustering():
        for page_path in page_paths:
            cluster_page(page_path)
    timed("baseline_clustering", run_clustering)

    def run_regions():
        for page_path in page_paths:
            generate_text_regions_for_page(page_path)
    timed("textregion", run_regions)

    clustered = []
    if not skip_gnn:
        # 5. GNN features + relation clustering; visual ('v') nets need the
        # region polygons in the JSONs and the page image at predict time
        gnn_predictor = gnn_predictor or RelationPredictor(gnn_model_dir)
        visual = bool(getattr(gnn_predictor, "image_input", False))
        json_paths = timed("features", lambda: generate_feature_jsons(
            page_paths, visual_regions=visual, separators="bb",
            image_paths=list(image_paths),
            line_features=heading_line_features))

        triples = _align_feature_jsons(json_paths, page_paths,
                                       list(image_paths))

        def run_gnn():
            # ONE relation-net forward per page group (union-graph batching)
            # instead of a dispatch+readback round trip per page
            for start in range(0, len(triples), batch_size):
                chunk = triples[start:start + batch_size]
                clustered.extend(gnn_clustering_for_pages(
                    [t[0] for t in chunk], gnn_predictor,
                    clustering_method=clustering_method, out_dir=out_dir,
                    page_paths=[t[1] for t in chunk],
                    image_paths=[t[2] for t in chunk]))
        timed("gnn_clustering", run_gnn)

    return {"pages": page_paths, "clustered": clustered, "timings": timings}


def run_full_workflow_pipelined(image_paths: Sequence[str],
                                separator_model_dir: Optional[str] = None,
                                heading_model_dir: Optional[str] = None,
                                gnn_model_dir: Optional[str] = None,
                                clustering_method: str = "dbscan",
                                out_dir: str = "",
                                timings: Optional[dict] = None,
                                separator_predictor=None,
                                heading_predictor=None,
                                gnn_predictor=None,
                                batch_size: int = 7,
                                force: bool = False,
                                separator_fixed_height: int = 1500,
                                heading_fixed_height: int = 900,
                                heading_device_swt: Optional[bool] = None
                                ) -> dict:
    """Wave-pipelined production driver (accelerator backends).

    Four-stage software pipeline over same-shape page groups; TWO big
    fused groups stay in flight so the wave's single device barrier waits
    on programs dispatched two host-waves earlier (the relay wire's
    latency/bandwidth is volatile — double slack keeps the host from
    blocking on it). Small device programs dispatched during a wave land
    BEHIND the next group's big fused programs in the in-order device
    queue — their drains run one wave LATER:

      wave i:  sep-materialize(i-2)            <- the only real barrier
               dispatch big fused programs(i)  <- overlaps everything below
               sep host work(i-2) + per-page heading line-feature dispatch
               heading finish(i-3), baselines/regions/features(i-3),
                 batched-GNN dispatch(i-3)
               GNN materialize(i-4) + clustering(i-4)

    Steady-state throughput approaches max(host tail, device) instead of
    their sum. File contracts and results are identical to
    :func:`run_full_workflow` (per-page stage order is preserved:
    separator write -> heading in place -> baselines -> regions ->
    features -> GNN). ``force=True`` runs the wave loop even on the CPU
    backend (tests); by default CPU falls back to the sequential driver.
    """
    import time as _time

    import jax

    if jax.default_backend() == "cpu" and not force:
        return run_full_workflow(
            image_paths, separator_model_dir, heading_model_dir,
            gnn_model_dir, clustering_method, out_dir,
            timings=timings, separator_predictor=separator_predictor,
            heading_predictor=heading_predictor, gnn_predictor=gnn_predictor,
            batch_size=batch_size,
            separator_fixed_height=separator_fixed_height,
            heading_fixed_height=heading_fixed_height,
            heading_device_swt=heading_device_swt)

    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.gnn_io import gnn_confidences_dispatch, gnn_clustering_for_page
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    timings = timings if timings is not None else {}
    t_start = _time.time()

    sep_predictor = separator_predictor or SegmentationPredictor(separator_model_dir)
    heading_predictor = heading_predictor or SegmentationPredictor(heading_model_dir)
    gnn_predictor = gnn_predictor or RelationPredictor(gnn_model_dir)
    visual = bool(getattr(gnn_predictor, "image_input", False))

    page_paths_all = [get_page_path(p) + ".xml" for p in image_paths]
    sep_proc = SeparatorNetPostProcessor(
        list(image_paths), sep_predictor,
        fixed_height=separator_fixed_height)
    head_proc = HeadingNetPostProcessor(
        list(image_paths), heading_predictor,
        fixed_height=heading_fixed_height,
        page_paths=page_paths_all, save_suffix="")
    head_proc.use_device_swt = heading_device_swt

    max_batch = min(batch_size,
                    getattr(sep_predictor, "MAX_DEVICE_BATCH", batch_size))
    clustered_by_path = {}

    def part(name, fn):
        t0 = _time.time()
        out = fn()
        timings[name] = timings.get(name, 0.0) + _time.time() - t0
        return out

    import jax.numpy as jnp
    import numpy as np

    from citlab_as_tpu.pagexml.page import page_cache

    from collections import deque

    # pipeline slots: group state advances big -> big (2 waves in flight)
    # -> head -> gnn -> done. TWO big groups stay in flight so the wave's
    # one device barrier (the separator mask download) waits on programs
    # dispatched TWO waves (~2x host wave work) earlier — the device and
    # the volatile relay wire get double the slack before the host ever
    # blocks on them (round-4: the 3-deep pipeline spent ~46 ms/page
    # waiting in separator_materialize)
    pend_bigs: deque = deque()   # <= 2 of (sep_entry, head_entry, chunk)
    pend_head = None   # (head_state, chunk)
    pend_gnn = None    # (materialize, [(json, page, image)] triples)

    # sub-part split of the separator host tail (unpack+native-post+trace
    # under 'contours', XML serialize under 'write') — merged into timings
    # as separator_drain.* at the end so the bench breakdown shows where
    # the drain actually goes
    sep_phase = {"load": 0.0, "dispatch": 0.0, "materialize": 0.0,
                 "contours": 0.0, "write": 0.0}

    def advance(images, chunk):
        nonlocal pend_head, pend_gnn
        new_head = new_gnn = None

        mat = None
        if len(pend_bigs) >= 2 or (images is None and pend_bigs):
            sep_entry, head_entry, pchunk = pend_bigs.popleft()
            # the pipeline's ONE barrier: download the separator group's
            # bit-packed masks (host work comes after the next dispatch)
            sep_np = part("separator_materialize",
                          lambda: sep_proc.fused_materialize(sep_entry))
            mat = (sep_np, head_entry, pchunk)

        if images is not None:
            def dispatch_big():
                padded = list(images)
                while len(padded) < max_batch:
                    padded.append(padded[-1])
                device_batch = jnp.asarray(np.stack(padded))
                sep_entry = sep_proc.fused_dispatch(
                    list(images), chunk, max_batch, device_batch=device_batch)
                head_entry = head_proc.fused_dispatch(
                    list(images), chunk, max_batch, device_batch=device_batch)
                # async-copy the group's separator masks behind its own
                # programs: the transfer rides the wire during this wave's
                # host tail instead of blocking at the materialize barrier
                sep_proc.fused_prefetch(sep_entry)
                return (sep_entry, head_entry, chunk)
            pend_bigs.append(part("dispatch", dispatch_big))

        if mat is not None:
            # host tail of the freshly materialized group overlaps the big
            # programs just dispatched; the per-line heading programs and
            # the group GNN land behind them in the queue, which is fine —
            # their drains happen a wave later, after the next barrier
            sep_np, head_entry, pchunk = mat
            part("separator_drain",
                 lambda: sep_proc.fused_drain(sep_np, {}, phase=sep_phase))
            head_state = part("heading_dispatch",
                              lambda: head_proc.fused_drain_dispatch(head_entry))
            new_head = (head_state, pchunk)

        if pend_head is not None:
            head_state, pchunk = pend_head
            # split halves: 'heading_drain' is the device wait (scalar
            # feature readback), 'heading_finish' the pure-host classify +
            # XML tail
            head_mat = part("heading_drain",
                            lambda: head_proc.fused_materialize(head_state))
            part("heading_finish",
                 lambda: head_proc.fused_finish(head_mat, {}))
            page_paths = [get_page_path(p) + ".xml" for p in pchunk]

            def run_baselines():
                for pp in page_paths:
                    cluster_page(pp)
            part("baseline_clustering", run_baselines)

            def run_regions():
                from citlab_as_tpu.stages.textregion import generate_text_regions_for_page
                for pp in page_paths:
                    generate_text_regions_for_page(pp)
            part("textregion", run_regions)

            json_paths = part("features", lambda: generate_feature_jsons(
                page_paths, visual_regions=visual, separators="bb",
                image_paths=list(pchunk),
                line_features=head_proc.line_features_by_page))
            # skipped pages (too few regions) drop out here — keep the
            # json/page/image triples aligned for the clustering wave
            triples = _align_feature_jsons(json_paths, page_paths,
                                           list(pchunk))
            _, materialize = part("gnn_dispatch", lambda: gnn_confidences_dispatch(
                [t[0] for t in triples], gnn_predictor,
                image_paths=[t[2] for t in triples]))
            new_gnn = (materialize, triples)

        if pend_gnn is not None:
            materialize, triples = pend_gnn
            # split: 'gnn_materialize' is the device wait on the relation
            # net's confidences, 'gnn_clustering' the pure-host clustering
            confs = part("gnn_materialize", materialize)

            def run_gnn():
                for i, (json_path, pp, ip) in enumerate(triples):
                    clustered_by_path[ip] = gnn_clustering_for_page(
                        json_path, gnn_predictor,
                        clustering_method=clustering_method,
                        out_dir=out_dir, page_path=pp, image_path=ip,
                        confidences=confs[i])
            part("gnn_clustering", run_gnn)

        pend_head, pend_gnn = new_head, new_gnn

    groups = SeparatorNetPostProcessor.group_by_shape(
        list(image_paths), max_batch)
    # page_cache: the host tail's stages each re-parse the page file the
    # previous stage just wrote; within this scope an unchanged file returns
    # the live Page instance instead (every stage still writes its output
    # file — the on-disk contract is unchanged)
    with page_cache():
        for images, chunk in groups:
            advance(images, chunk)
        for _ in range(4):   # flush the four pipeline stages
            advance(None, None)

    # pipeline fully drained -> quiet queue: drop the relay-poison pins
    # (upload batches + per-group outputs held by ops.device_hold), which
    # otherwise accumulate ~20 MB per page group over a long run
    from citlab_as_tpu.ops.device_hold import release
    release()

    clustered = [clustered_by_path[p] for p in image_paths
                 if p in clustered_by_path]
    for k in ("contours", "write"):
        timings["separator_drain." + k] = (
            timings.get("separator_drain." + k, 0.0) + sep_phase[k])
    timings["total"] = timings.get("total", 0.0) + _time.time() - t_start
    return {"pages": page_paths_all, "clustered": clustered,
            "timings": timings}


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_image_list", type=str, required=True)
    parser.add_argument("--separator_model_dir", type=str, default=None)
    parser.add_argument("--heading_model_dir", type=str, default=None)
    parser.add_argument("--gnn_model_dir", type=str, default=None)
    parser.add_argument("--clustering_method", type=str, default="dbscan")
    parser.add_argument("--out_dir", type=str, default="")
    parser.add_argument("--skip_heading", action="store_true", default=False)
    parser.add_argument("--skip_gnn", action="store_true", default=False)
    parser.add_argument("--batch_size", type=int, default=7)
    parser.add_argument("--pipelined", action="store_true", default=False,
                        help="wave-pipelined driver: every host stage "
                             "overlaps device compute (accelerator only)")
    args = parser.parse_args(argv)

    from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    image_paths = load_list_file(args.path_to_image_list)
    if args.pipelined and not args.skip_heading and not args.skip_gnn:
        result = run_full_workflow_pipelined(
            image_paths, args.separator_model_dir, args.heading_model_dir,
            args.gnn_model_dir, args.clustering_method, args.out_dir,
            batch_size=args.batch_size)
    else:
        result = run_full_workflow(
            image_paths, args.separator_model_dir, args.heading_model_dir,
            args.gnn_model_dir, args.clustering_method, args.out_dir,
            args.skip_heading, args.skip_gnn, batch_size=args.batch_size)
    # the pipelined driver records wall-clock under 'total' alongside the
    # per-part keys; summing both would double-count
    timings = result["timings"]
    total = timings.get("total") or sum(timings.values())
    logger.info("Workflow done: %d pages in %.2fs (%.2f pages/s)",
                len(image_paths), total, len(image_paths) / max(total, 1e-9))
    return result


if __name__ == "__main__":
    main()
