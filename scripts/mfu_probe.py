"""MFU probe: XLA conv vs im2col-packed matmul at ARU-Net layer shapes.

The ARU-Net's early blocks (8/16/32 channels) underfill the 128-lane MXU;
this probe measures, on the real chip, whether reformulating a SAME 3x3
conv as [extract overlapping (f+2)x(f+2) patches stride f] @ [dense
(f+2)^2*Cin x f^2*Cout matmul] buys throughput despite the (f+2)^2/9 FLOP
inflation. Prints a per-shape table.

Usage: python scripts/mfu_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

B = 7
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=10):
    def barrier(o):
        # device-side gather of ONE element -> 2-byte transfer; a full
        # np.asarray would download the whole activation and swamp the timing
        return float(o.reshape(-1)[0])

    out = fn(*args)
    barrier(out)   # compile + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / iters


LOOP = 20


def timeit_fused(step, x0, iters=3):
    """Time ``step`` chained LOOP times INSIDE one jit (lax.scan carrying the
    activation) — one dispatch per measurement, so per-call tunnel latency
    (~5-10 ms) cannot pollute per-op numbers."""
    @jax.jit
    def many(x):
        def body(carry, _):
            return step(carry), ()
        y, _ = jax.lax.scan(body, x, None, length=LOOP)
        return y

    def barrier(o):
        return float(o.reshape(-1)[0])

    barrier(many(x0))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(x0)
    barrier(out)
    return (time.perf_counter() - t0) / (iters * LOOP)


@partial(jax.jit, static_argnames=())
def conv3x3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b).astype(DTYPE)


def conv3x3_step(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b).astype(DTYPE)


def extract_patches(x, f):
    """[B,H,W,C] -> [B,H/f,W/f,(f+2)^2*C] overlapping patches (SAME pad 1)."""
    bsz, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(f + 2):
        for dx in range(f + 2):
            sl = jax.lax.slice(xp, (0, dy, dx, 0),
                               (bsz, dy + h - f + 1, dx + w - f + 1, c),
                               (1, f, f, 1))
            cols.append(sl)
    return jnp.concatenate(cols, axis=-1)


def make_packed(f, cin, cout):
    @jax.jit
    def packed(x, wmat, b):
        p = extract_patches(x, f)
        bsz, hf, wf, _ = p.shape
        y = jnp.einsum("bhwk,ko->bhwo", p, wmat,
                       preferred_element_type=jnp.float32)
        return (y + b).astype(DTYPE)
    return packed


def pack_kernel(w, f):
    """[3,3,Cin,Cout] -> [(f+2)^2*Cin, f^2*Cout] scattering the 3x3 taps to
    every in-block output position (exact same linear map as the conv)."""
    k, _, cin, cout = w.shape
    m = np.zeros(((f + 2) * (f + 2) * cin, f * f * cout), np.float32)
    wnp = np.asarray(w, np.float32)
    for oy in range(f):
        for ox in range(f):
            for ky in range(3):
                for kx in range(3):
                    iy, ix = oy + ky, ox + kx      # in padded patch coords
                    src = (iy * (f + 2) + ix) * cin
                    dst = (oy * f + ox) * cout
                    m[src:src + cin, dst:dst + cout] += wnp[ky, kx]
    return m


def check_equiv(f, cin, cout, h=64, w=64):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, cin), jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    wm = jnp.asarray(pack_kernel(wk, f))
    p = extract_patches(x, f)
    y = jnp.einsum("bhwk,ko->bhwo", p, wm)
    # unpack: [1,h/f,w/f,f*f*cout] -> [1,h,w,cout]
    y = y.reshape(1, h // f, w // f, f, f, cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(1, h, w, cout)
    err = float(jnp.max(jnp.abs(y - ref)))
    print(f"  equivalence f={f} cin={cin}: max abs err {err:.2e}")
    assert err < 1e-3


def main():
    print("device:", jax.devices()[0])
    check_equiv(4, 8, 8)
    check_equiv(2, 16, 16)

    rng = np.random.RandomState(0)
    shapes = [
        # (label, H, W, Cin, Cout, f)
        ("scale0 1536x1024 c8", 1536, 1024, 8, 8, 4),
        ("scale1 768x512 c16", 768, 512, 16, 16, 2),
        ("scale2 384x256 c32", 384, 256, 32, 32, 2),
        ("scale3 192x128 c64", 192, 128, 64, 64, 1),
        ("scale4 96x64 c128", 96, 64, 128, 128, 1),
    ]
    # calibrate: raw matmul peak (bf16) with the same in-jit loop
    a = jnp.asarray(rng.randn(4096, 4096), DTYPE)
    t_mm = timeit_fused(
        lambda m: jnp.dot(m, a, preferred_element_type=jnp.float32
                          ).astype(DTYPE), a)
    print(f"matmul 4096^3: {t_mm*1e3:7.3f} ms "
          f"({2*4096**3/t_mm/1e12:6.1f} TF/s peak-ish)")

    for label, h, w, cin, cout, f in shapes:
        x = jnp.asarray(rng.randn(B, h, w, cin), DTYPE)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, DTYPE)
        bias = jnp.zeros((cout,), DTYPE)
        t_conv = timeit_fused(lambda t: conv3x3_step(t, wk, bias), x)
        gflop = B * h * w * 9 * cin * cout * 2 / 1e9
        line = (f"{label}: conv {t_conv*1e3:7.3f} ms "
                f"({gflop/t_conv/1e3:6.1f} TF/s)")
        if f > 1:
            wm = jnp.asarray(pack_kernel(np.asarray(wk, np.float32), f), DTYPE)
            bias_p = jnp.zeros((f * f * cout,), DTYPE)

            def packed_step(t):
                p = extract_patches(t, f)
                y = jnp.einsum("bhwk,ko->bhwo", p, wm,
                               preferred_element_type=jnp.float32)
                y = (y + bias_p).astype(DTYPE)
                # unpack back to full res so the scan carry keeps one shape
                bsz, hf, wf, _ = y.shape
                y = y.reshape(bsz, hf, wf, f, f, cout)
                y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, h, w, cout)
                return y
            t_packed = timeit_fused(packed_step, x)
            line += (f" | packed f={f} {t_packed*1e3:7.3f} ms "
                     f"(speedup {t_conv/t_packed:4.2f}x)")
        print(line)


if __name__ == "__main__":
    main()
