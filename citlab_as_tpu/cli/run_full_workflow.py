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
                      heading_device_swt: Optional[bool] = None,
                      fault_tolerant: bool = True,
                      clustering_params: Optional[dict] = None) -> dict:
    """Returns {'pages': [...], 'timings': {stage: seconds}}. Predictors may
    be injected directly (tests / custom models); otherwise they are loaded
    from the given model dirs (random-init when None).
    ``heading_device_swt`` overrides the heading stage's device-SWT
    autodetection (None = on for accelerator backends).
    ``fault_tolerant=True`` applies the reference's per-page log-and-skip
    contract (see :func:`run_full_workflow_pipelined`); skips are returned
    under ``'skipped'``. ``clustering_params`` overrides the
    TextblockClustering method defaults (e.g. ``confidence_threshold``;
    run_gnn_clustering.py:69-72 double-parse equivalent)."""
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
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

    from citlab_as_tpu.config import runtime
    runtime.validate()     # bad CITLAB_* values fail fast, not per page

    from citlab_as_tpu.utils.faults import SkippedPages
    skipped = SkippedPages() if fault_tolerant else None

    # 1. separator detection (batched + dispatch-ahead when multi-page)
    sep_predictor = separator_predictor or SegmentationPredictor(separator_model_dir)
    sep_proc = SeparatorNetPostProcessor(
        list(image_paths), sep_predictor,
        fixed_height=separator_fixed_height)
    if skipped is not None:
        sep_proc.on_page_error = skipped.record
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
            heading_fixed_height, heading_device_swt, skipped,
            clustering_params)


def _run_post_separator_stages(image_paths, page_paths, heading_model_dir,
                               gnn_model_dir, clustering_method, out_dir,
                               skip_heading, skip_gnn, timings, timed,
                               heading_predictor, gnn_predictor, batch_size,
                               heading_fixed_height,
                               heading_device_swt=None, skipped=None,
                               clustering_params=None):
    """Stages 2-5 of :func:`run_full_workflow`, run inside a page_cache()
    scope: each stage re-reads the page file the previous stage just wrote,
    so the scoped parse memo removes one DOM parse per stage per page
    (files are still written — the on-disk contract is unchanged).
    ``skipped`` (utils.faults.SkippedPages) applies the per-page
    log-and-skip contract; a page recorded by any stage drops out of every
    later stage."""
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    all_page_paths = list(page_paths)

    def live_pairs():
        return [(pp, ip) for pp, ip in zip(all_page_paths, image_paths)
                if skipped is None or ip not in skipped]

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
        if skipped is not None:
            proc.on_page_error = skipped.record
        timed("heading", lambda: proc.run_batched(batch_size=batch_size)
              if len(image_paths) > 1 else proc.run())
        heading_line_features = proc.line_features_by_page

    # 3. baseline clustering + 4. text regions
    def run_clustering():
        for pp, ip in live_pairs():
            if skipped is None:
                cluster_page(pp)
            else:
                skipped.guard(ip, "baseline_clustering",
                              lambda pp=pp: cluster_page(pp))
    timed("baseline_clustering", run_clustering)

    def run_regions():
        for pp, ip in live_pairs():
            if skipped is None:
                generate_text_regions_for_page(pp)
            else:
                skipped.guard(ip, "textregion",
                              lambda pp=pp: generate_text_regions_for_page(pp))
    timed("textregion", run_regions)

    clustered = []
    if not skip_gnn:
        # 5. GNN features + relation clustering; visual ('v') nets need the
        # region polygons in the JSONs and the page image at predict time
        gnn_predictor = gnn_predictor or RelationPredictor(gnn_model_dir)
        visual = bool(getattr(gnn_predictor, "image_input", False))
        pairs = live_pairs()
        json_paths = timed("features", lambda: generate_feature_jsons(
            [pp for pp, _ in pairs], visual_regions=visual, separators="bb",
            image_paths=[ip for _, ip in pairs],
            line_features=heading_line_features))

        triples = _align_feature_jsons(json_paths, [pp for pp, _ in pairs],
                                       [ip for _, ip in pairs])

        def run_gnn():
            # ONE relation-net forward per page group (union-graph batching)
            # instead of a dispatch+readback round trip per page; the
            # clustering/write guard is PER PAGE (one failing page must not
            # mark its chunk-mates skipped after their XML is written)
            from citlab_as_tpu.stages.gnn_io import (
                gnn_clustering_for_page, gnn_confidences_dispatch)
            for start in range(0, len(triples), batch_size):
                chunk = triples[start:start + batch_size]

                def dispatch(chunk=chunk):
                    _, materialize = gnn_confidences_dispatch(
                        [t[0] for t in chunk], gnn_predictor,
                        image_paths=[t[2] for t in chunk])
                    return materialize()
                if skipped is None:
                    confs = dispatch()
                else:
                    try:
                        confs = dispatch()
                    except Exception as e:  # noqa: BLE001 - skip contract
                        for _json, _pp, ip in chunk:
                            skipped.record(ip, "gnn_dispatch", e)
                        continue
                for i, (json_path, pp, ip) in enumerate(chunk):
                    def cluster_one(i=i, json_path=json_path, pp=pp, ip=ip):
                        clustered.append(gnn_clustering_for_page(
                            json_path, gnn_predictor,
                            clustering_method=clustering_method,
                            clustering_params=clustering_params,
                            out_dir=out_dir, page_path=pp, image_path=ip,
                            confidences=confs[i]))
                    if skipped is None:
                        cluster_one()
                    else:
                        skipped.guard(ip, "gnn_clustering", cluster_one)
        timed("gnn_clustering", run_gnn)

    return {"pages": all_page_paths, "clustered": clustered,
            "timings": timings,
            "skipped": skipped.as_list() if skipped is not None else []}


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
                                heading_device_swt: Optional[bool] = None,
                                fault_tolerant: bool = True,
                                mesh=None,
                                host_workers: int = 0,
                                clustering_params: Optional[dict] = None
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

    ``fault_tolerant=True`` (production default) applies the reference's
    log-and-skip contract per page (run_baseline_clustering.py:39-42,
    feature_generation.py:855-911): one truncated image or corrupt XML
    drops that page from every downstream wave instead of killing the
    batch; the skip list is returned under ``'skipped'``.

    Multi-chip: ``mesh`` (a (data, model) ``jax.sharding.Mesh``,
    parallel.mesh.make_mesh) runs every device program data-parallel —
    page groups grow to ``batch_size * n_data`` and shard over the 'data'
    axis with replicated params (GSPMD derives the per-chip programs; the
    reference's L10 host-process sharding, run_net_post_processing.py:61-82,
    becomes one process driving the whole slice). ``host_workers > 1``
    additionally fans the wave's host tail (baselines -> regions ->
    features, the GIL-bound geometry chain) over a persistent spawn pool
    (stages/host_chain.py) so the host side scales with cores like the
    device side scales with chips.
    """
    import time as _time

    import jax

    from citlab_as_tpu.config import runtime
    runtime.validate()     # bad CITLAB_* values fail fast, not per page

    if jax.default_backend() == "cpu" and not force:
        return run_full_workflow(
            image_paths, separator_model_dir, heading_model_dir,
            gnn_model_dir, clustering_method, out_dir,
            timings=timings, separator_predictor=separator_predictor,
            heading_predictor=heading_predictor, gnn_predictor=gnn_predictor,
            batch_size=batch_size,
            separator_fixed_height=separator_fixed_height,
            heading_fixed_height=heading_fixed_height,
            heading_device_swt=heading_device_swt,
            fault_tolerant=fault_tolerant,
            clustering_params=clustering_params)

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

    from citlab_as_tpu.utils.faults import SkippedPages
    skipped = SkippedPages() if fault_tolerant else None

    page_paths_all = [get_page_path(p) + ".xml" for p in image_paths]
    sep_proc = SeparatorNetPostProcessor(
        list(image_paths), sep_predictor,
        fixed_height=separator_fixed_height)
    head_proc = HeadingNetPostProcessor(
        list(image_paths), heading_predictor,
        fixed_height=heading_fixed_height,
        page_paths=page_paths_all, save_suffix="")
    head_proc.use_device_swt = heading_device_swt
    if skipped is not None:
        sep_proc.on_page_error = skipped.record
        head_proc.on_page_error = skipped.record

    max_batch = min(batch_size,
                    getattr(sep_predictor, "MAX_DEVICE_BATCH", batch_size))
    if mesh is not None:
        from citlab_as_tpu.parallel.mesh import replicate, shard_batch
        n_data = mesh.shape["data"]
        # params replicate once; page groups grow to one per-chip batch per
        # device and shard on 'data' in dispatch_big
        for pred in (sep_predictor, heading_predictor):
            if getattr(pred, "variables", None) is not None:
                pred.variables = replicate(mesh, pred.variables)
        if hasattr(gnn_predictor, "mesh") and gnn_predictor.mesh is None:
            gnn_predictor.mesh = mesh
            gnn_predictor._n_data = n_data
            if gnn_predictor.variables is not None:
                gnn_predictor.variables = replicate(mesh,
                                                    gnn_predictor.variables)
        max_batch *= n_data

    pool = None
    if host_workers > 1:
        from citlab_as_tpu.stages.host_chain import host_chain_builder
        from citlab_as_tpu.utils.workers import PersistentPool
        pool = PersistentPool(host_chain_builder, host_workers)
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
                if mesh is not None:
                    # batch sharded over 'data', params replicated: GSPMD
                    # derives the per-chip fused programs (computation
                    # follows data; parity: test_parallel.py sharded tests)
                    device_batch = shard_batch(mesh, device_batch)
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
            # pages skipped upstream (load/separator/heading) drop out of
            # every downstream wave here
            live = [ip for ip in pchunk
                    if skipped is None or ip not in skipped]
            page_paths = [get_page_path(p) + ".xml" for p in live]

            if pool is not None:
                # host tail fanned over the persistent worker pool: one
                # composite per-page task (baselines -> regions -> features,
                # stages/host_chain.py), wall time ~ chain/workers
                items = [{"page_path": pp, "image_path": ip,
                          "visual": visual,
                          "line_features":
                              head_proc.line_features_by_page.get(pp)}
                         for pp, ip in zip(page_paths, live)]
                results, pool_skipped = part(
                    "host_chain", lambda: pool.map_items(items))
                if skipped is not None:
                    for item in pool_skipped:
                        skipped.record(item["image_path"], "host_chain",
                                       RuntimeError(
                                           "host_chain worker error "
                                           "(see worker log)"))
                elif pool_skipped:
                    # fault_tolerant=False promises raise-through — worker
                    # failures must not silently drop pages from the output
                    raise RuntimeError(
                        "host_chain worker error on "
                        + ", ".join(i["image_path"] for i in pool_skipped)
                        + " (fault_tolerant=False; see worker log)")
                json_by_page = {item["page_path"]: val
                                for item, val in results if val}
                # None values = features legitimately skipped the page
                # (too few regions) — drop from triples, not a fault
                triples = [(json_by_page[pp], pp, ip)
                           for pp, ip in zip(page_paths, live)
                           if pp in json_by_page]
            else:
                def run_baselines():
                    for pp, ip in zip(page_paths, live):
                        if skipped is None:
                            cluster_page(pp)
                        else:
                            skipped.guard(ip, "baseline_clustering",
                                          lambda pp=pp: cluster_page(pp))
                part("baseline_clustering", run_baselines)

                def run_regions():
                    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page
                    for pp, ip in zip(page_paths, live):
                        if skipped is None:
                            generate_text_regions_for_page(pp)
                        else:
                            skipped.guard(ip, "textregion",
                                          lambda pp=pp: generate_text_regions_for_page(pp))
                part("textregion", run_regions)

                live = [ip for ip in live
                        if skipped is None or ip not in skipped]
                page_paths = [get_page_path(p) + ".xml" for p in live]
                json_paths = part("features", lambda: generate_feature_jsons(
                    page_paths, visual_regions=visual, separators="bb",
                    image_paths=list(live),
                    line_features=head_proc.line_features_by_page))
                # skipped pages (too few regions) drop out here — keep the
                # json/page/image triples aligned for the clustering wave
                triples = _align_feature_jsons(json_paths, page_paths,
                                               list(live))

            def dispatch_gnn():
                _, materialize = gnn_confidences_dispatch(
                    [t[0] for t in triples], gnn_predictor,
                    image_paths=[t[2] for t in triples])
                return materialize
            if skipped is None or not triples:
                materialize = part("gnn_dispatch", dispatch_gnn) \
                    if triples else None
            else:
                # group-level guard: a failing batched dispatch skips the
                # wave's pages rather than the whole batch
                def dispatch_guarded():
                    try:
                        return dispatch_gnn()
                    except Exception as e:  # noqa: BLE001 - skip contract
                        for _json, _pp, ip in triples:
                            skipped.record(ip, "gnn_dispatch", e)
                        return None
                materialize = part("gnn_dispatch", dispatch_guarded)
            new_gnn = (materialize, triples) if materialize else None

        if pend_gnn is not None:
            materialize, triples = pend_gnn
            # split: 'gnn_materialize' is the device wait on the relation
            # net's confidences, 'gnn_clustering' the pure-host clustering
            confs = part("gnn_materialize", materialize)

            def run_gnn():
                for i, (json_path, pp, ip) in enumerate(triples):
                    def cluster_one(i=i, json_path=json_path, pp=pp, ip=ip):
                        clustered_by_path[ip] = gnn_clustering_for_page(
                            json_path, gnn_predictor,
                            clustering_method=clustering_method,
                            clustering_params=clustering_params,
                            out_dir=out_dir, page_path=pp, image_path=ip,
                            confidences=confs[i])
                    if skipped is None:
                        cluster_one()
                    else:
                        skipped.guard(ip, "gnn_clustering", cluster_one)
            part("gnn_clustering", run_gnn)

        pend_head, pend_gnn = new_head, new_gnn

    groups = SeparatorNetPostProcessor.group_by_shape(
        list(image_paths), max_batch,
        on_error=skipped.record if skipped is not None else None)
    # page_cache: the host tail's stages each re-parse the page file the
    # previous stage just wrote; within this scope an unchanged file returns
    # the live Page instance instead (every stage still writes its output
    # file — the on-disk contract is unchanged)
    try:
        with page_cache():
            for images, chunk in groups:
                advance(images, chunk)
            for _ in range(4):   # flush the four pipeline stages
                advance(None, None)
    finally:
        if pool is not None:
            pool.close()

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
            "timings": timings,
            "skipped": skipped.as_list() if skipped is not None else []}


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
    parser.add_argument("--data_parallel", action="store_true", default=False,
                        help="shard page groups over ALL visible devices "
                             "(jax.sharding mesh, params replicated); "
                             "implies --pipelined")
    parser.add_argument("--host_workers", type=int, default=0,
                        help="fan the host geometry tail (baselines/regions/"
                             "features) over N worker processes (pipelined "
                             "driver only; 0/1 = in-process)")
    parser.add_argument("--clustering_params", type=str, default=None,
                        help="key=value[,key=value...] overrides for the "
                             "TextblockClustering method params, e.g. "
                             "confidence_threshold=0.6 (the reference's "
                             "clustering_params dict flag, "
                             "run_gnn_clustering.py:69-72)")
    args = parser.parse_args(argv)
    clustering_params = None
    if args.clustering_params:
        from citlab_as_tpu.config.flags import parse_dict_flag
        clustering_params = parse_dict_flag(args.clustering_params)

    from citlab_as_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    image_paths = load_list_file(args.path_to_image_list)
    if ((args.pipelined or args.data_parallel)
            and not args.skip_heading and not args.skip_gnn):
        mesh = None
        if args.data_parallel:
            import jax
            if len(jax.devices()) > 1:
                from citlab_as_tpu.parallel.mesh import make_mesh
                mesh = make_mesh()
        result = run_full_workflow_pipelined(
            image_paths, args.separator_model_dir, args.heading_model_dir,
            args.gnn_model_dir, args.clustering_method, args.out_dir,
            batch_size=args.batch_size, mesh=mesh,
            host_workers=args.host_workers,
            clustering_params=clustering_params)
    else:
        result = run_full_workflow(
            image_paths, args.separator_model_dir, args.heading_model_dir,
            args.gnn_model_dir, args.clustering_method, args.out_dir,
            args.skip_heading, args.skip_gnn, batch_size=args.batch_size,
            clustering_params=clustering_params)
    # the pipelined driver records wall-clock under 'total' alongside the
    # per-part keys; summing both would double-count
    timings = result["timings"]
    total = timings.get("total") or sum(timings.values())
    logger.info("Workflow done: %d pages in %.2fs (%.2f pages/s)",
                len(image_paths), total, len(image_paths) / max(total, 1e-9))
    return result


if __name__ == "__main__":
    main()
