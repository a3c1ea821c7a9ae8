"""Conv variant probe at ARU early-block shapes: dtype (bf16 vs f32),
layout (NHWC vs NCHW), and the shifted space-to-depth packed conv
(exact 3x3 conv re-expressed as a [2,2, 4C, 4C] conv over 2x2 blocks,
quadrupling lane occupancy for 1.78x the FLOPs).

Usage: python -u scripts/probe_conv_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = 7
LOOP = 10


def timeit_fused(step, x0, iters=3):
    @jax.jit
    def many(x):
        def body(carry, _):
            y = step(carry)
            return carry + 0.0 * y.reshape(-1)[0].astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, x, None, length=LOOP)
        return out

    barrier = lambda o: float(o.reshape(-1)[0])
    barrier(many(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(x0)
    barrier(out)
    return (time.perf_counter() - t0) / (iters * LOOP)


def block_kernel(w3: np.ndarray) -> np.ndarray:
    """[3,3,C,C'] 3x3 kernel -> [2,2,4C,4C'] kernel over 2x2 blocks with the
    input packing shifted by (-1,-1) (pad 1 top/left before packing)."""
    _, _, cin, cout = w3.shape
    wb = np.zeros((2, 2, 4 * cin, 4 * cout), w3.dtype)
    for di in range(2):
        for dj in range(2):
            for py in range(2):
                for px in range(2):
                    for oy in range(2):
                        for ox in range(2):
                            ky = 2 * di + py - oy
                            kx = 2 * dj + px - ox
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                src = (py * 2 + px)
                                dst = (oy * 2 + ox)
                                wb[di, dj, src * cin:(src + 1) * cin,
                                   dst * cout:(dst + 1) * cout] = w3[ky, kx]
    return wb


def s2d_conv(x, wb, cout):
    """Exact SAME 3x3 conv via the packed [2,2,4C,4C'] kernel."""
    bsz, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xb = xp.reshape(bsz, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
        bsz, (h + 2) // 2, (w + 2) // 2, 4 * c)
    yb = lax.conv_general_dilated(
        xb, wb, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    yb = yb.reshape(bsz, h // 2, w // 2, 2, 2, cout)
    y = yb.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h, w, cout)
    return y


def check_s2d_equiv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 48, 8), jnp.float32)
    w3 = rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1
    ref = lax.conv_general_dilated(
        x, jnp.asarray(w3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = s2d_conv(x, jnp.asarray(block_kernel(w3)), 8)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"s2d_conv equivalence: max abs err {err:.2e}")
    assert err < 1e-4


def main():
    print("device:", jax.devices()[0])
    check_s2d_equiv()
    rng = np.random.RandomState(0)

    for label, h, w, c in [("scale0", 1536, 1024, 8),
                           ("scale1", 768, 512, 16),
                           ("scale2", 384, 256, 32)]:
        w3 = rng.randn(3, 3, c, c).astype(np.float32) * 0.1
        gflop = B * h * w * 9 * c * c * 2 / 1e9
        results = {}
        for dname, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
            x = jnp.asarray(rng.randn(B, h, w, c), dt)
            wk = jnp.asarray(w3, dt)

            def step_nhwc(t, wk=wk, dt=dt):
                y = lax.conv_general_dilated(
                    t, wk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                return y.astype(dt)
            results[f"nhwc_{dname}"] = timeit_fused(step_nhwc, x)

            xc = jnp.asarray(rng.randn(B, c, h, w), dt)
            wkc = jnp.asarray(w3.transpose(3, 2, 0, 1), dt)  # OIHW

            def step_nchw(t, wkc=wkc, dt=dt):
                y = lax.conv_general_dilated(
                    t, wkc, (1, 1), "SAME",
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    preferred_element_type=jnp.float32)
                return y.astype(dt)
            results[f"nchw_{dname}"] = timeit_fused(step_nchw, xc)

            wb = jnp.asarray(block_kernel(w3), dt)

            def step_s2d(t, wb=wb, dt=dt, c=c):
                return s2d_conv(t, wb, c).astype(dt)
            results[f"s2d_{dname}"] = timeit_fused(step_s2d, x)

        base = results["nhwc_bf16"]
        parts = [f"{k} {v*1e3:7.3f} ms ({gflop/v/1e3:5.1f} TF/s, "
                 f"{base/v:4.2f}x)" for k, v in results.items()]
        print(f"{label} {h}x{w} c{c}:\n  " + "\n  ".join(parts))


if __name__ == "__main__":
    main()
