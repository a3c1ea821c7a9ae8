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
import time
from typing import Optional, Sequence

from citlab_as_tpu.utils.io import get_page_path, load_list_file

logger = logging.getLogger(__name__)


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
                      batch_size: int = 7) -> dict:
    """Returns {'pages': [...], 'timings': {stage: seconds}}. Predictors may
    be injected directly (tests / custom models); otherwise they are loaded
    from the given model dirs (random-init when None)."""
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    from citlab_as_tpu.stages.baseline_clustering import cluster_page
    from citlab_as_tpu.stages.features import generate_feature_jsons
    from citlab_as_tpu.stages.gnn_io import gnn_clustering_for_page
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
        list(image_paths), sep_predictor, fixed_height=1500)
    if len(image_paths) > 1 and hasattr(sep_predictor, "predict_batch"):
        timed("separator", lambda: sep_proc.run_batched(batch_size=batch_size))
    else:
        timed("separator", sep_proc.run)

    # The separator stage writes <page>.xml.xml; subsequent stages read those
    page_paths = [get_page_path(p) + ".xml" for p in image_paths]

    # 2. heading detection, chained onto the separator-stage output pages
    # (updated in place via page_paths + empty save_suffix); batched +
    # dispatch-ahead, fused device path on accelerator backends
    if not skip_heading:
        heading_predictor = heading_predictor or SegmentationPredictor(heading_model_dir)
        proc = HeadingNetPostProcessor(
            list(image_paths), heading_predictor, fixed_height=900,
            page_paths=page_paths, save_suffix="")
        timed("heading", lambda: proc.run_batched(batch_size=batch_size)
              if len(image_paths) > 1 else proc.run())

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
            image_paths=list(image_paths)))

        def run_gnn():
            for json_path, page_path, image_path in zip(
                    json_paths, page_paths, image_paths):
                out = gnn_clustering_for_page(
                    json_path, gnn_predictor,
                    clustering_method=clustering_method,
                    out_dir=out_dir, page_path=page_path,
                    image_path=image_path)
                clustered.append(out)
        timed("gnn_clustering", run_gnn)

    return {"pages": page_paths, "clustered": clustered, "timings": timings}


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
    args = parser.parse_args(argv)

    image_paths = load_list_file(args.path_to_image_list)
    result = run_full_workflow(
        image_paths, args.separator_model_dir, args.heading_model_dir,
        args.gnn_model_dir, args.clustering_method, args.out_dir,
        args.skip_heading, args.skip_gnn, batch_size=args.batch_size)
    total = sum(result["timings"].values())
    logger.info("Workflow done: %d pages in %.2fs (%.2f pages/s)",
                len(image_paths), total, len(image_paths) / max(total, 1e-9))
    return result


if __name__ == "__main__":
    main()
