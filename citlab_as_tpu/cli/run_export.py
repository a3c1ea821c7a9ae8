"""Freeze an orbax checkpoint into one deployable ``.frozen`` artifact.

Reference analog: the trainer's frozen-``.pb`` export (model_base.py:391-504)
that inference CLIs consume. Predictors accept the resulting path wherever
they accept a checkpoint dir.

    python -m citlab_as_tpu.cli.run_export \
        --checkpoint_dir models_ckpt/separator --architecture arunet \
        --out separator.frozen
"""
from __future__ import annotations

import json
from typing import Optional, Sequence

from citlab_as_tpu.config.flags import LineArgumentParser


def main(argv: Optional[Sequence[str]] = None):
    parser = LineArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_dir", required=True,
                        help="orbax checkpoint dir (latest step) or a "
                             "best/<metric> export dir")
    parser.add_argument("--out", required=True, help="output .frozen path")
    parser.add_argument("--architecture", required=True,
                        choices=["arunet", "graph_relation", "inception_v3"])
    parser.add_argument("--model_kwargs", default="{}",
                        help="JSON dict of model constructor kwargs")
    args = parser.parse_args(argv)

    from citlab_as_tpu.train.export import export_checkpoint_frozen
    path = export_checkpoint_frozen(
        args.checkpoint_dir, args.out, args.architecture,
        model_kwargs=json.loads(args.model_kwargs))
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
