"""Composite per-page host tail for worker fan-out (pipeline stages 3-5a).

The wave-pipelined driver's host tail between the heading finish and the
GNN dispatch — DBSCAN baseline clustering, text-region generation, GNN
feature JSON — is pure-Python geometry on one page file at a time and
therefore GIL-bound in the parent. On multi-core production hosts
(a v5e-8 host exposes >100 vCPUs) it fans out over
``utils.workers.PersistentPool``; this module is the picklable worker
side: one function running the whole chain for ONE page, so each page is
parsed once per worker instead of once per stage.

Reference analog: run_baseline_clustering.py:10-43 /
run_textregion_generation.py:10-35 run these stages as subprocess-per-XML;
the TPU-native rebuild keeps the per-page process isolation but returns
values instead of scraping stdout.
"""
from __future__ import annotations

from typing import Optional


def host_chain_builder():
    """``fn_builder`` for :class:`citlab_as_tpu.utils.workers.PersistentPool`.

    The returned callable takes one item dict::

        {"page_path": str, "image_path": str, "visual": bool,
         "line_features": {line_id: (bbox, sw, th)} | None}

    and returns the page's feature-JSON path (None when the features stage
    skipped the page, e.g. too few text regions). Any exception skips the
    page under the pool's log-and-skip contract.
    """
    from citlab_as_tpu.pagexml.page import page_cache
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.textregion import generate_text_regions_for_page

    def run_chain(item: dict) -> Optional[str]:
        page_path = item["page_path"]
        lf = item.get("line_features")
        with page_cache():   # the 3 stages re-read the file each other wrote
            cluster_page(page_path)
            generate_text_regions_for_page(page_path)
            json_paths = generate_feature_jsons(
                [page_path], visual_regions=item.get("visual", False),
                separators="bb", image_paths=[item["image_path"]],
                line_features={page_path: lf} if lf is not None else None)
        return json_paths[0] if json_paths else None

    return run_chain
