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
    args = parser.parse_args(argv)

    from citlab_as_tpu.inference import SegmentationPredictor

    image_paths = load_list_file(args.path_to_image_list)
    fixed_height = args.fixed_height
    if fixed_height is None:
        fixed_height = 900 if args.mode == "heading" else 1500

    predictor = SegmentationPredictor(args.model_dir)

    if args.mode == "separator":
        from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
        proc = SeparatorNetPostProcessor(
            image_paths, predictor, fixed_height=fixed_height,
            scaling_factor=args.scaling_factor, threshold=args.threshold)
    else:
        from citlab_as_tpu.stages.heading import HeadingNetPostProcessor
        proc = HeadingNetPostProcessor(
            image_paths, predictor, fixed_height=fixed_height,
            scaling_factor=args.scaling_factor,
            threshold=0.4, text_line_percentage=args.text_line_percentage)
    proc.run()


if __name__ == "__main__":
    main()
