"""Benchmark: ARU-Net separator inference throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >= 50 full pages/s end-to-end on a v5e-8. This benchmark measures the
dominant-FLOPs piece — ARU-Net forward at the separator stage's working
resolution (fixed_height 1500, typical page 1500x1024) — in pages/s on ONE
chip; vs_baseline reports value / (50/8) i.e. against the per-chip north-star
share.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from citlab_as_tpu.models.arunet import ARUNet

H, W = 1536, 1024  # fixed_height-1500 page padded to a multiple of 16
BATCH = 4
WARMUP = 2
ITERS = 10


def main():
    model = ARUNet(n_classes=2, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((BATCH, H, W, 1), jnp.float32)
    variables = model.init(rng, x[:1])

    @jax.jit
    def forward(variables, image):
        logits, _ = model.apply(variables, image)
        return jax.nn.softmax(logits, axis=-1)

    for _ in range(WARMUP):
        jax.block_until_ready(forward(variables, x))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pages_per_s = BATCH * ITERS / dt
    mpix_per_s = pages_per_s * H * W / 1e6
    north_star_per_chip = 50.0 / 8.0
    print(json.dumps({
        "metric": f"ARU-Net separator forward pages/s ({H}x{W}, batch {BATCH}, 1 chip)",
        "value": round(pages_per_s, 3),
        "unit": "pages/s",
        "vs_baseline": round(pages_per_s / north_star_per_chip, 3),
        "extra": {"MPix/s": round(mpix_per_s, 1), "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
