"""Pallas TPU kernel: 3x3 SAME conv as x-packed MXU matmuls.

STATUS: experimental, NOT enabled in production (USE_MXU_CONV defaults to
False). Measured on v5e (full ARU forward, batch 7 @ 1536x1024): 0.28x vs
XLA's convs. The kernel itself is correct (exactness tests pass) but two
costs erase the theoretical MXU win: (1) Mosaic does not support
lane-regrouping shape casts or offset-mismatched lane concats in-kernel, so
the [W, C] -> [G, P*C] packing must happen as XLA relayouts outside the
kernel (~4.3 ms per scale-0 conv, more than half of XLA's entire conv
time), and (2) the three row-shifted input views triple HBM read traffic.
A competitive conv kernel here needs either Mosaic-level lane regrouping or
a chain-level design that keeps whole residual blocks in packed layout —
measured notes in the round's progress log. Kept as a tested building
block + documentation of the measured hardware behavior.

Original rationale: XLA's conv lowering on v5e reaches only ~2-8 TF/s for
the ARU-Net's low-channel blocks (8/16/32 channels fill 6-25% of the
128-lane MXU), while plain matmuls hit ~110 TF/s on the same chip; and an
XLA-side im2col loses the win to the HBM round trip of the materialized
patch matrix (scale-0 activations are ~176 MB at batch 7). This kernel
packs P = 128/C_out output columns per lane row so the MXU sees
[rows, 128] tiles, and consumes the patch pieces straight from VMEM:

- the wrapper pre-builds six non-overlapping VIEWS of the padded input
  (3 row shifts x {main group columns [R, G, P*C], 2-column halo
  [R, G, 2*C]}) with plain XLA slices/reshapes;
- the kernel computes acc = sum of six matmuls against the matching row
  slices of the packed weight matrix — no in-kernel concat or
  lane-changing reshape (both unsupported by Mosaic), identical math;
- bias add + optional ReLU fused; output leaves in packed [B, H, G, 128]
  layout; a row-major XLA reshape ((g, p, co) -> (col, co)) restores NHWC.

The dense packed weights do (P+2)/P * 3 = up to 6x the conv's FLOPs
(P=16), but at full MXU utilization that is still a large net win for
C_out <= 32. For C_out >= 64 XLA's conv is already near its plateau and
this kernel is not used.

Exactness: identical linear map to lax.conv (same taps, f32 accumulation);
parity tests in tests/test_pallas_conv.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pack_weights(w3: jnp.ndarray, p: int) -> jnp.ndarray:
    """[3, 3, Cin, Cout] -> [3*(P+2)*Cin, P*Cout] patch matmul matrix.

    Row index (ky, j, c): row offset ky, patch column j (0..P+1, covering
    original columns g*P + j - 1), input channel c. Column index (p, co).
    Entry = w3[ky, j - p, c, co] when 0 <= j - p < 3 (output column g*P + p
    reads original columns g*P + p - 1 .. g*P + p + 1 = patch cols p..p+2).
    Per ky the rows split into the 'main' block (j < P) and the 2-column
    'halo' block (j >= P) — the kernel consumes them as separate matmuls.
    """
    _, _, cin, cout = w3.shape
    rows = []
    for ky in range(3):
        for j in range(p + 2):
            cols = []
            for pp in range(p):
                kx = j - pp
                if 0 <= kx < 3:
                    cols.append(w3[ky, kx])                 # [Cin, Cout]
                else:
                    cols.append(jnp.zeros_like(w3[0, 0]))
            rows.append(jnp.concatenate(cols, axis=-1))     # [Cin, P*Cout]
    return jnp.concatenate(rows, axis=0)                    # [3(P+2)Cin, PCout]


def _conv_kernel(m0, h0, m1, h1, m2, h2, w_ref, b_ref, out_ref, *,
                 groups: int, p: int, cin: int, relu: bool):
    """Six accumulated matmuls against row slices of the packed weights."""
    r = m0.shape[1]
    mk = p * cin            # main contraction per row offset
    hk = 2 * cin            # halo contraction per row offset
    stride = mk + hk

    def mat(ref, k):
        return ref[0].reshape(r * groups, k)

    acc = jnp.dot(mat(m0, mk), w_ref[0:mk],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(mat(h0, hk), w_ref[mk:stride],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(mat(m1, mk), w_ref[stride:stride + mk],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(mat(h1, hk), w_ref[stride + mk:2 * stride],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(mat(m2, mk), w_ref[2 * stride:2 * stride + mk],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(mat(h2, hk), w_ref[2 * stride + mk:3 * stride],
                   preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(r, groups, LANES).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("relu", "tile_rows"))
def conv3x3_mxu(x: jnp.ndarray, w3: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, relu: bool = False,
                tile_rows: int = 32) -> jnp.ndarray:
    """Exact SAME 3x3 stride-1 conv, NHWC, via the packed-matmul kernel.

    Requires 128 % C_out == 0 (C_out in {8, 16, 32, 64, 128}); intended for
    C_out <= 32 where XLA's conv underfills the MXU.
    """
    b, h, w, cin = x.shape
    cout = w3.shape[-1]
    assert LANES % cout == 0, f"C_out={cout} must divide {LANES}"
    p = LANES // cout
    groups = -(-w // p)                  # ceil: output groups per row
    wp = (groups + 1) * p                # padded cols: 1 left + right slack
    hp = -(-h // tile_rows) * tile_rows  # rows padded to tile multiple

    dtype = x.dtype
    xpad = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, wp - w - 1), (0, 0)))

    # per row shift ky: main groups [B, Hp, G, P*C] + 2-col halo [B, Hp, G, 2C]
    mains, halos = [], []
    for ky in range(3):
        v = jax.lax.slice_in_dim(xpad, ky, ky + hp, axis=1)
        v = v.reshape(b, hp, groups + 1, p * cin)
        mains.append(v[:, :, :groups, :])
        halos.append(v[:, :, 1:, :2 * cin])

    wmat = _pack_weights(w3.astype(dtype), p)               # [K, 128]
    if bias is None:
        bias = jnp.zeros((cout,), dtype)
    bias_packed = jnp.tile(bias.astype(dtype), p)[None, :]  # [1, 128]

    kernel = partial(_conv_kernel, groups=groups, p=p, cin=cin, relu=relu)

    def spec(last):
        return pl.BlockSpec((1, tile_rows, groups, last),
                            lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(b, hp // tile_rows),
        in_specs=[spec(p * cin), spec(2 * cin), spec(p * cin),
                  spec(2 * cin), spec(p * cin), spec(2 * cin),
                  pl.BlockSpec(wmat.shape, lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_rows, groups, LANES),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, groups, LANES), dtype),
    )(mains[0], halos[0], mains[1], halos[1], mains[2], halos[2],
      wmat, bias_packed)

    # packed (g, p, co) -> (col, co) is a row-major reshape; crop the pads
    y = out.reshape(b, hp, groups * p, cout)
    return y[:, :h, :w, :]
