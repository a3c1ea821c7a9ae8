"""Inception v3 backbone in flax (reference: article_separation/backbones/
Inception_v3.py:7-585).

Used as the visual-feature extractor of the GNN ('v' in mixed_gnn_vn7e2):
the endpoints Mixed_5d / Mixed_6e / Mixed_7c feed the multi-resolution
feature maps whose per-region max-pools become visual node/edge features.
Standard Inception v3 topology (conv+BN+relu units, A/B/C blocks with
factorized 7x7 in B), NHWC, endpoints dict returned alongside the final map.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvUnit(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9997,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvUnit(64, (1, 1), dtype=self.dtype)(x, train)
        b5 = ConvUnit(48, (1, 1), dtype=self.dtype)(x, train)
        b5 = ConvUnit(64, (5, 5), dtype=self.dtype)(b5, train)
        b3 = ConvUnit(64, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvUnit(96, (3, 3), dtype=self.dtype)(b3, train)
        b3 = ConvUnit(96, (3, 3), dtype=self.dtype)(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvUnit(self.pool_features, (1, 1), dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvUnit(384, (3, 3), strides=(2, 2), padding="VALID",
                      dtype=self.dtype)(x, train)
        bd = ConvUnit(64, (1, 1), dtype=self.dtype)(x, train)
        bd = ConvUnit(96, (3, 3), dtype=self.dtype)(bd, train)
        bd = ConvUnit(96, (3, 3), strides=(2, 2), padding="VALID",
                      dtype=self.dtype)(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionB(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c7 = self.channels_7x7
        b1 = ConvUnit(192, (1, 1), dtype=self.dtype)(x, train)
        b7 = ConvUnit(c7, (1, 1), dtype=self.dtype)(x, train)
        b7 = ConvUnit(c7, (1, 7), dtype=self.dtype)(b7, train)
        b7 = ConvUnit(192, (7, 1), dtype=self.dtype)(b7, train)
        bd = ConvUnit(c7, (1, 1), dtype=self.dtype)(x, train)
        bd = ConvUnit(c7, (7, 1), dtype=self.dtype)(bd, train)
        bd = ConvUnit(c7, (1, 7), dtype=self.dtype)(bd, train)
        bd = ConvUnit(c7, (7, 1), dtype=self.dtype)(bd, train)
        bd = ConvUnit(192, (1, 7), dtype=self.dtype)(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvUnit(192, (1, 1), dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class ReductionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b3 = ConvUnit(192, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvUnit(320, (3, 3), strides=(2, 2), padding="VALID",
                      dtype=self.dtype)(b3, train)
        b7 = ConvUnit(192, (1, 1), dtype=self.dtype)(x, train)
        b7 = ConvUnit(192, (1, 7), dtype=self.dtype)(b7, train)
        b7 = ConvUnit(192, (7, 1), dtype=self.dtype)(b7, train)
        b7 = ConvUnit(192, (3, 3), strides=(2, 2), padding="VALID",
                      dtype=self.dtype)(b7, train)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionC(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvUnit(320, (1, 1), dtype=self.dtype)(x, train)
        b3 = ConvUnit(384, (1, 1), dtype=self.dtype)(x, train)
        b3a = ConvUnit(384, (1, 3), dtype=self.dtype)(b3, train)
        b3b = ConvUnit(384, (3, 1), dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvUnit(448, (1, 1), dtype=self.dtype)(x, train)
        bd = ConvUnit(384, (3, 3), dtype=self.dtype)(bd, train)
        bda = ConvUnit(384, (1, 3), dtype=self.dtype)(bd, train)
        bdb = ConvUnit(384, (3, 1), dtype=self.dtype)(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        bp = ConvUnit(192, (1, 1), dtype=self.dtype)(bp, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Endpoints: Mixed_5b..5d (288ch), Mixed_6a..6e (768ch),
    Mixed_7a..7c (1280/2048ch). Call returns (final_map, endpoints)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps: Dict[str, jnp.ndarray] = {}
        x = ConvUnit(32, (3, 3), strides=(2, 2), padding="VALID",
                     dtype=self.dtype, name="Conv2d_1a_3x3")(x, train)
        x = ConvUnit(32, (3, 3), padding="VALID", dtype=self.dtype,
                     name="Conv2d_2a_3x3")(x, train)
        x = ConvUnit(64, (3, 3), dtype=self.dtype, name="Conv2d_2b_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvUnit(80, (1, 1), padding="VALID", dtype=self.dtype,
                     name="Conv2d_3b_1x1")(x, train)
        x = ConvUnit(192, (3, 3), padding="VALID", dtype=self.dtype,
                     name="Conv2d_4a_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x, train)
        eps["Mixed_5b"] = x
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x, train)
        eps["Mixed_5c"] = x
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x, train)
        eps["Mixed_5d"] = x

        x = ReductionA(dtype=self.dtype, name="Mixed_6a")(x, train)
        eps["Mixed_6a"] = x
        for i, c7 in enumerate((128, 160, 160, 192)):
            x = InceptionB(c7, dtype=self.dtype, name=f"Mixed_6{'bcde'[i]}")(x, train)
            eps[f"Mixed_6{'bcde'[i]}"] = x

        x = ReductionB(dtype=self.dtype, name="Mixed_7a")(x, train)
        eps["Mixed_7a"] = x
        x = InceptionC(dtype=self.dtype, name="Mixed_7b")(x, train)
        eps["Mixed_7b"] = x
        x = InceptionC(dtype=self.dtype, name="Mixed_7c")(x, train)
        eps["Mixed_7c"] = x
        return x, eps
