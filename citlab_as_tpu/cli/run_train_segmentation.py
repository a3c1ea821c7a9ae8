"""ARU-Net segmentation trainer CLI (separator / heading nets)."""
from __future__ import annotations

import argparse
from typing import Optional, Sequence


def main(argv: Optional[Sequence[str]] = None):
    # multi-host bring-up when a coordinator is configured via the standard
    # JAX env vars; no-op single-host (parallel/mesh.py)
    from citlab_as_tpu.parallel.mesh import initialize_multihost
    initialize_multihost()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--train_gt_dir", type=str, required=True,
                        help="GT generator output dir (grey imgs + C3/).")
    parser.add_argument("--eval_gt_dir", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--steps_per_epoch", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--crop_size", type=int, nargs=2, default=(512, 512))
    parser.add_argument("--n_classes", type=int, default=2)
    parser.add_argument("--graph", type=str, default="ARU",
                        choices=["U", "RU", "ARU"])
    parser.add_argument("--ema_decay", type=float, default=0.0)
    parser.add_argument("--early_stopping_patience", type=int, default=0)
    parser.add_argument("--optimizer_params", nargs="*", default=[],
                        metavar="KEY=VAL")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from citlab_as_tpu.config.flags import _parse_dict_value
    from citlab_as_tpu.train.seg_trainer import TrainerSegmentation

    optimizer_params = {}
    for kv in args.optimizer_params:
        if "=" in kv:
            key, val = kv.split("=", 1)
            optimizer_params[key] = _parse_dict_value(val)

    trainer = TrainerSegmentation(
        args.model_dir, args.train_gt_dir, args.eval_gt_dir,
        flags={"epochs": args.epochs, "steps_per_epoch": args.steps_per_epoch,
               "batch_size": args.batch_size,
               "crop_size": tuple(args.crop_size),
               "n_classes": args.n_classes, "ema_decay": args.ema_decay,
               "early_stopping_patience": args.early_stopping_patience},
        graph_params={"graph": args.graph},
        optimizer_params=optimizer_params, seed=args.seed)
    return trainer.train()


if __name__ == "__main__":
    main()
