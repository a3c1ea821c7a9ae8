"""Microbenchmark: 3x3 conv at ARU channel counts — XLA conv vs
space-to-depth packed conv (4x4 blocks -> channels x16, so C=8 becomes 128,
exactly one MXU lane tile).

Hypothesis (round-4): the ARU forward is slow (~24 ms/page/net at bf16)
because C=8..16 convs underfill the TPU lane dimension; re-expressing the
conv in a space-to-depth layout trades 16x more MACs for ~100x better MXU
utilization. This probe measures a full-resolution residual-block-sized
chain (4 convs) both ways on the real chip.

Usage: python -u scripts/probe_s2d_conv.py
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 7, 1536, 1024, 8
BLK = 4


def barrier(x):
    import numpy as np
    _ = np.asarray(x.ravel()[0])


def main():
    from citlab_as_tpu.utils.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    ks = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.1)
          for _ in range(4)]
    bs = [jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
          for _ in range(4)]
    barrier(x.astype(jnp.float32))

    def conv(x_, k, b):
        y = jax.lax.conv_general_dilated(
            x_, k.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + b[None, None, None, :]).astype(jnp.bfloat16)

    @jax.jit
    def chain_xla(x_):
        y = conv(x_, ks[0], bs[0])
        o = y
        y = jax.nn.relu(y)
        for i in (1, 2):
            y = jax.nn.relu(conv(y, ks[i], bs[i]))
        y = conv(y, ks[3], bs[3])
        return jax.nn.relu(y + o)

    # ---- space-to-depth variant --------------------------------------
    def s2d(x_):
        b, h, w, c = x_.shape
        y = x_.reshape(b, h // BLK, BLK, w // BLK, BLK, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // BLK, w // BLK, BLK * BLK * c)

    def d2s(x_, c):
        b, hh, ww, _ = x_.shape
        y = x_.reshape(b, hh, ww, BLK, BLK, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh * BLK, ww * BLK, c)

    def pack_kernel(k):
        """[3,3,C,Co] pixel kernel -> [3,3,16C,16Co] block kernel: output
        block position (i,j) gets contributions from input block (bi,bj)
        inner position (p,q) iff p = i + dy - 4*bi etc. for dy in [-1,1]."""
        kh, kw, cin, cout = k.shape
        r = kh // 2
        pk = np.zeros((3, 3, BLK * BLK * cin, BLK * BLK * cout), np.float32)
        kn = np.asarray(k, np.float32)
        for i in range(BLK):
            for j in range(BLK):
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        sy, sx = i + dy, j + dx
                        bi, bj = sy // BLK, sx // BLK     # -1, 0, or 1
                        p, q = sy - BLK * bi, sx - BLK * bj
                        pk[bi + 1, bj + 1,
                           (p * BLK + q) * cin:(p * BLK + q + 1) * cin,
                           (i * BLK + j) * cout:(i * BLK + j + 1) * cout] \
                            = kn[dy + r, dx + r]
        return jnp.asarray(pk)

    pks = [pack_kernel(k) for k in ks]
    pbs = [jnp.tile(b, BLK * BLK) for b in bs]

    def pconv(x_, pk, pb):
        y = jax.lax.conv_general_dilated(
            x_, pk.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + pb[None, None, None, :]).astype(jnp.bfloat16)

    @jax.jit
    def chain_s2d(x_):
        y = s2d(x_)
        y = pconv(y, pks[0], pbs[0])
        o = y
        y = jax.nn.relu(y)
        for i in (1, 2):
            y = jax.nn.relu(pconv(y, pks[i], pbs[i]))
        y = pconv(y, pks[3], pbs[3])
        y = jax.nn.relu(y + o)
        return d2s(y, C)

    out = {"shape": f"{B}x{H}x{W}x{C}", "block": BLK}
    ref = np.asarray(chain_xla(x).astype(jnp.float32))
    got = np.asarray(chain_s2d(x).astype(jnp.float32))
    err = float(np.max(np.abs(ref - got)))
    out["max_abs_diff"] = err
    print("max_abs_diff:", err, flush=True)

    for name, fn in (("xla_chain", chain_xla), ("s2d_chain", chain_s2d)):
        barrier(fn(x).astype(jnp.float32))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            barrier(fn(x).astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        out[name + "_ms"] = round(best * 1000, 1)
        print(name, out[name + "_ms"], "ms", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
