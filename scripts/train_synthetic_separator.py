"""Train the ARU-Net separator (or heading) net on on-device synthetic pages.

The whole loop runs on the TPU: the jitted synthetic-page generator feeds
the jitted train step from a folded PRNG key, so the slow host<->device
tunnel only moves the final checkpoint. Produces an orbax checkpoint under
--model_dir usable by inference.SegmentationPredictor.

Usage: python scripts/train_synthetic_separator.py --model_dir models/separator
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--mode", choices=["separator", "heading"],
                        default="separator")
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--crop", type=int, default=512)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--target_class_weight", type=float, default=8.0,
                        help="CE weight of the rare target class (0).")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from citlab_as_tpu.models.arunet import ARUNet
    from citlab_as_tpu.train.checkpoint import save_checkpoint
    from citlab_as_tpu.train.segmentation import segmentation_loss
    from citlab_as_tpu.train.synthetic_data import synthetic_batch

    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(args.seed)
    init_x = jnp.zeros((1, args.crop, args.crop, 1), jnp.float32)
    params = model.init(rng, init_x)
    optimizer = optax.adam(
        optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1))
    opt_state = optimizer.init(params)
    heading_mode = args.mode == "heading"

    class_weights = jnp.asarray([args.target_class_weight, 1.0])

    @jax.jit
    def step(params, opt_state, key):
        image, label = synthetic_batch(key, args.batch, args.crop, args.crop,
                                       heading_mode=heading_mode)

        def loss_fn(p):
            logits, _ = model.apply(p, image, train=True)
            return segmentation_loss(logits, label, class_weights=class_weights)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_metrics(params, key):
        image, label = synthetic_batch(key, args.batch, args.crop, args.crop,
                                       heading_mode=heading_mode)
        logits, _ = model.apply(params, image)
        pred = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((pred == label).astype(jnp.float32))
        target = label == 0
        hit = (pred == 0) & target
        recall = hit.sum() / jnp.maximum(target.sum(), 1)
        precision = hit.sum() / jnp.maximum((pred == 0).sum(), 1)
        return acc, precision, recall

    t0 = time.time()
    loss_val = None
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(rng, i))
        if i % 50 == 0 or i == args.steps - 1:
            loss_val = float(loss)  # host sync only every 50 steps
            print(f"step {i}: loss={loss_val:.4f} ({time.time() - t0:.1f}s)",
                  flush=True)

    acc, precision, recall = (float(v) for v in eval_metrics(
        params, jax.random.fold_in(rng, 10 ** 6)))
    print(f"final: acc={acc:.4f} sep_precision={precision:.4f} "
          f"sep_recall={recall:.4f}")

    path = save_checkpoint(args.model_dir, args.steps, {"params": params})
    print(f"saved checkpoint to {path}")
    return acc, precision, recall


if __name__ == "__main__":
    main()
