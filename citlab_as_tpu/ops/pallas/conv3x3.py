"""Pallas TPU kernel: 3x3 SAME conv as an x-packed im2col matmul.

Why: XLA's conv lowering on v5e reaches only ~2-8 TF/s for the ARU-Net's
low-channel blocks (8/16/32 channels fill 6-25% of the 128-lane MXU), while
a plain matmul hits ~110 TF/s on the same chip. This kernel re-expresses
the conv so the MXU sees full 128-lane matmuls:

- pack P = 128/C_out output columns per lane row, so the output tile is
  [rows, P*C_out = 128];
- the needed inputs for one packed group are the (P+2)-column window of the
  3 input rows -> an im2col patch of K = 3*(P+2)*C_in lanes, built with two
  VMEM slices + concat per row offset (the overlap between adjacent groups
  is exactly the first 2 columns of the next group);
- one [R*G, K] @ [K, 128] matmul + bias + optional ReLU per tile.

The dense patch matmul does (P+2)/P * 3 = up to 6x the conv's FLOPs
(P=16), but at full MXU utilization that is still a large net win for
C_out <= 32. For C_out >= 64 XLA's conv is already near its plateau and
this kernel is not used.

Row halos are avoided by passing three row-shifted VIEWS of the padded
input (XLA materializes them; ~3x input HBM traffic, negligible vs the
matmul). The output leaves the kernel in packed [B, H, G, 128] layout and
a plain XLA reshape (row-major: (g, p, co) -> (col, co)) restores NHWC.

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

    Row index (ky, j, c): patch row offset ky, patch column j (0..P+1,
    covering original columns g*P + j - 1), input channel c. Column index
    (p, co): packed output column p, output channel co. Entry =
    w3[ky, j - p, c, co] when 0 <= j - p < 3 (output column g*P + p reads
    original columns g*P + p - 1 .. g*P + p + 1 = patch cols p .. p + 2).
    """
    _, _, cin, cout = w3.shape
    rows = []
    for ky in range(3):
        for j in range(p + 2):
            # [Cin, P*Cout] block for this (ky, j)
            cols = []
            for pp in range(p):
                kx = j - pp
                if 0 <= kx < 3:
                    cols.append(w3[ky, kx])                 # [Cin, Cout]
                else:
                    cols.append(jnp.zeros_like(w3[0, 0]))
            rows.append(jnp.concatenate(cols, axis=-1))     # [Cin, P*Cout]
    return jnp.concatenate(rows, axis=0)                    # [3(P+2)Cin, PCout]


def _conv_kernel(xm_ref, x0_ref, xp_ref, w_ref, b_ref, out_ref, *,
                 groups: int, p: int, cin: int, relu: bool):
    r = xm_ref.shape[1]

    def patches_from(ref):
        blocks = ref[0].reshape(r, groups + 1, p * cin)
        return jnp.concatenate(
            [blocks[:, :groups, :], blocks[:, 1:groups + 1, :2 * cin]],
            axis=-1)                                        # [R, G, (P+2)Cin]

    patches = jnp.concatenate(
        [patches_from(xm_ref), patches_from(x0_ref), patches_from(xp_ref)],
        axis=-1)                                            # [R, G, 3(P+2)Cin]
    patches = patches.reshape(r * groups, 3 * (p + 2) * cin)
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(r, groups, LANES).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("relu", "tile_rows"))
def conv3x3_mxu(x: jnp.ndarray, w3: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, relu: bool = False,
                tile_rows: int = 8) -> jnp.ndarray:
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
    # three row-shifted H-row views: original rows r-1, r, r+1
    xm = jax.lax.slice_in_dim(xpad, 0, hp, axis=1)
    x0 = jax.lax.slice_in_dim(xpad, 1, hp + 1, axis=1)
    xp_ = jax.lax.slice_in_dim(xpad, 2, hp + 2, axis=1)

    wmat = _pack_weights(w3.astype(dtype), p)               # [K, 128]
    if bias is None:
        bias = jnp.zeros((cout,), dtype)
    bias_packed = jnp.tile(bias.astype(dtype), p)[None, :]  # [1, 128]

    kernel = partial(_conv_kernel, groups=groups, p=p, cin=cin, relu=relu)
    spec_x = pl.BlockSpec((1, tile_rows, wp, cin),
                          lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        grid=(b, hp // tile_rows),
        in_specs=[spec_x, spec_x, spec_x,
                  pl.BlockSpec(wmat.shape, lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LANES), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_rows, groups, LANES),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, groups, LANES), dtype),
    )(xm, x0, xp_, wmat, bias_packed)

    # packed (g, p, co) -> (col, co) is a row-major reshape; crop the pads
    y = out.reshape(b, hp, groups * p, cout)
    return y[:, :h, :w, :]
