"""GNN relation inference + clustering CLI (reference: gnn/run_gnn_clustering.py)."""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

from citlab_as_tpu.utils.io import load_list_file
from citlab_as_tpu.utils.logging import setup_custom_logger

logger = setup_custom_logger(__name__)


def _parse_mask(mask_str):
    if not mask_str:
        return None
    return [int(v) for v in mask_str.strip("[]").split(",")]


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None,
                        help="GNN checkpoint dir (orbax; best export ok).")
    parser.add_argument("--eval_list", type=str, required=True,
                        help="List of graph-feature JSON paths.")
    parser.add_argument("--clustering_method", type=str, default="dbscan",
                        choices=["greedy", "dbscan", "dbscan_std", "linkage"])
    parser.add_argument("--clustering_params", nargs="*", default=[],
                        metavar="KEY=VAL")
    parser.add_argument("--node_input_feature_mask", type=str, default=None,
                        help="e.g. [1,1,1,1,0,0,0,0,0,0,0,0,1,1,1]")
    parser.add_argument("--edge_input_feature_mask", type=str, default=None)
    parser.add_argument("--save_conf", action="store_true", default=False)
    parser.add_argument("--out_dir", type=str, default="")
    parser.add_argument("--mask_horizontally_separated_confs",
                        action="store_true", default=False)
    parser.add_argument("--mask_heading_separated_confs",
                        action="store_true", default=False)
    parser.add_argument("--image_input", action="store_true", default=False,
                        help="Visual 'v' nets: feed the page image through "
                             "the visual backbone (run_gnn_clustering"
                             ".py:223-279).")
    parser.add_argument("--visual_backbone", type=str, default="ARU_v1")
    parser.add_argument("--assign_visual_features_to_nodes",
                        type=lambda s: s.lower() != "false", default=True)
    parser.add_argument("--assign_visual_features_to_edges",
                        type=lambda s: s.lower() != "false", default=False)
    args = parser.parse_args(argv)

    from citlab_as_tpu.config.flags import _parse_dict_value
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.stages.gnn_io import gnn_clustering_for_page

    clustering_params = {}
    for kv in args.clustering_params:
        if "=" in kv:
            key, val = kv.split("=", 1)
            clustering_params[key] = _parse_dict_value(val)

    predictor = RelationPredictor(
        args.model_dir,
        node_feature_mask=_parse_mask(args.node_input_feature_mask),
        edge_feature_mask=_parse_mask(args.edge_input_feature_mask),
        image_input=args.image_input,
        visual_backbone=args.visual_backbone,
        assign_visual_features_to_nodes=args.assign_visual_features_to_nodes,
        assign_visual_features_to_edges=args.assign_visual_features_to_edges)

    json_paths = load_list_file(args.eval_list)
    done = 0
    for json_path in json_paths:
        try:
            gnn_clustering_for_page(
                json_path, predictor,
                clustering_method=args.clustering_method,
                clustering_params=clustering_params,
                save_conf=args.save_conf, out_dir=args.out_dir,
                mask_horizontally_separated=args.mask_horizontally_separated_confs,
                mask_heading_separated=args.mask_heading_separated_confs)
            done += 1
        except Exception as e:
            logger.error("Skipping %s: %s", json_path, e)
    logger.info("Clustered %d/%d pages.", done, len(json_paths))


if __name__ == "__main__":
    main()
