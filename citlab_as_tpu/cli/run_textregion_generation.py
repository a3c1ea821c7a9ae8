"""Text region generation CLI (reference: run_textregion_generation.py +
textregion_generation.py)."""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

from citlab_as_tpu.stages.textregion import generate_text_regions_for_page
from citlab_as_tpu.utils.io import load_list_file
from citlab_as_tpu.utils.logging import setup_custom_logger

logger = setup_custom_logger(__name__)


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path_to_xml_file", type=str, default=None)
    parser.add_argument("--path_to_xml_lst", type=str, default=None)
    parser.add_argument("--des_dist", type=int, default=50)
    parser.add_argument("--max_d", type=int, default=100)
    parser.add_argument("--alpha", type=float, default=75)
    args = parser.parse_args(argv)

    if args.path_to_xml_file:
        paths = [args.path_to_xml_file]
    elif args.path_to_xml_lst:
        paths = load_list_file(args.path_to_xml_lst)
    else:
        parser.error("Provide --path_to_xml_file or --path_to_xml_lst")

    skipped = []
    for path in paths:
        try:
            generate_text_regions_for_page(
                path, des_dist=args.des_dist, max_d=args.max_d, alpha=args.alpha)
        except Exception as e:
            logger.error("Skipping %s: %s", path, e)
            skipped.append(path)
    logger.info("Processed %d/%d files.", len(paths) - len(skipped), len(paths))


if __name__ == "__main__":
    main()
