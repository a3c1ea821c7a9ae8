"""Separator / heading detection CLI (reference:
run_net_post_processing.py:26-82). Defaults: fixed_height 1500 (separator) /
900 (heading), threshold 0.05."""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

from citlab_as_tpu.utils.io import load_list_file


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_image_list", type=str, required=True,
                        help="List file holding the image paths.")
    parser.add_argument("--model_dir", type=str, default=None,
                        help="ARU-Net checkpoint directory (orbax).")
    parser.add_argument("--mode", type=str, required=True,
                        choices=["heading", "separator"])
    parser.add_argument("--fixed_height", type=int, default=None)
    parser.add_argument("--scaling_factor", type=float, default=1.0)
    parser.add_argument("--threshold", type=float, default=0.05,
                        help="Binarization threshold for the net output.")
    parser.add_argument("--text_line_percentage", type=float, default=0.8)
    parser.add_argument("--batch_size", type=int, default=0,
                        help="Separator mode: batch pages through the net "
                             "(0 = per-page). Replaces the reference's "
                             "process fan-out (run_net_post_processing"
                             ".py:61-82).")
    parser.add_argument("--sharded", action="store_true", default=False,
                        help="Shard page batches over all devices "
                             "(data-parallel mesh inference).")
    args = parser.parse_args(argv)

    from citlab_as_tpu.inference import (
        SegmentationPredictor, ShardedSegmentationPredictor)

    image_paths = load_list_file(args.path_to_image_list)
    fixed_height = args.fixed_height
    if fixed_height is None:
        fixed_height = 900 if args.mode == "heading" else 1500

    if args.sharded:
        predictor = ShardedSegmentationPredictor(args.model_dir)
    else:
        predictor = SegmentationPredictor(args.model_dir)

    if args.mode == "separator":
        from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
        proc = SeparatorNetPostProcessor(
            image_paths, predictor, fixed_height=fixed_height,
            scaling_factor=args.scaling_factor, threshold=args.threshold)
        if args.batch_size > 0:
            proc.run_batched(args.batch_size)
        else:
            proc.run()
    else:
        from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
        proc = HeadingNetPostProcessor(
            image_paths, predictor, fixed_height=fixed_height,
            scaling_factor=args.scaling_factor,
            threshold=0.4, text_line_percentage=args.text_line_percentage)
        proc.run()


if __name__ == "__main__":
    main()
