"""Re-cluster from saved confidence JSONs (reference: gnn/run_conf_to_cluster.py)."""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

from citlab_as_tpu.stages.gnn_io import conf_to_cluster
from citlab_as_tpu.utils.io import load_list_file


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf_list", type=str, required=True,
                        help="List of *_confidences.json paths.")
    parser.add_argument("--clustering_method", type=str, default="greedy",
                        choices=["greedy", "dbscan", "dbscan_std", "linkage"])
    parser.add_argument("--clustering_params", nargs="*", default=[],
                        metavar="KEY=VAL")
    parser.add_argument("--out_dir", type=str, default="")
    args = parser.parse_args(argv)

    from citlab_as_tpu.config.flags import _parse_dict_value
    clustering_params = {}
    for kv in args.clustering_params:
        if "=" in kv:
            key, val = kv.split("=", 1)
            clustering_params[key] = _parse_dict_value(val)

    conf_to_cluster(load_list_file(args.conf_list),
                    clustering_method=args.clustering_method,
                    clustering_params=clustering_params,
                    out_dir=args.out_dir)


if __name__ == "__main__":
    main()
