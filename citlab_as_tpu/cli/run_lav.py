"""LAV CLI: load-and-validate an exported relation model
(reference: gnn/trainer/lav_rel.py)."""
from __future__ import annotations

import argparse
import json
from typing import Optional, Sequence


def main(argv: Optional[Sequence[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--eval_list", type=str, required=True)
    parser.add_argument("--num_p_r_thresholds", type=int, default=20)
    parser.add_argument("--out_json", type=str, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from citlab_as_tpu.models.gnn.model import GraphRelation
    from citlab_as_tpu.train.checkpoint import restore_checkpoint
    from citlab_as_tpu.train.input_pipeline import InputGNN
    from citlab_as_tpu.train.lav import lav_relation
    from citlab_as_tpu.utils.io import load_list_file

    eval_list = load_list_file(args.eval_list)
    model = GraphRelation(num_classes=2)

    inp = InputGNN()
    batch_np, _, _ = next(iter(inp.eval_batches(eval_list)))
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch_np.items()})
    state, step = restore_checkpoint(args.model_dir, {"params": variables})
    if step is None:
        raise FileNotFoundError(f"No checkpoint in {args.model_dir}")
    result = lav_relation(model, state["params"], eval_list,
                          num_p_r_thresholds=args.num_p_r_thresholds)
    print(json.dumps(result, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
