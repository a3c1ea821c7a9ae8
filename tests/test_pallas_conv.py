"""Pallas packed-matmul conv kernel: exactness vs lax.conv and through the
ARU-Net flag (interpret mode on the CPU test backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from citlab_as_tpu.ops.pallas.conv3x3 import conv3x3_mxu

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("shape", [
    (2, 32, 48, 8, 8), (1, 16, 32, 16, 16), (1, 20, 40, 4, 8),
    (1, 18, 30, 16, 8), (1, 32, 32, 32, 32), (1, 24, 64, 8, 32),
])
def test_conv3x3_mxu_matches_lax(shape):
    b, h, w, cin, cout = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = conv3x3_mxu(x, w3, bias, tile_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv3x3_mxu_relu_fusion():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.3, jnp.float32)
    got = conv3x3_mxu(x, w3, None, relu=True, tile_rows=8)
    assert float(jnp.min(got)) >= 0.0


def test_arunet_flag_parity():
    """ARUNet with USE_MXU_CONV on == off (same params), to f32 tolerance."""
    from citlab_as_tpu.models import arunet
    from citlab_as_tpu.models.arunet import ARUNet

    model = ARUNet(n_classes=2, graph_params={
        "graph": "RU", "featRoot": 8, "scale_space_num": 3, "res_depth": 1})
    x = jnp.asarray(np.random.RandomState(0).rand(1, 48, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref, _ = model.apply(variables, x)
    arunet.set_mxu_conv(True)
    try:
        got, _ = model.apply(variables, x)
    finally:
        arunet.set_mxu_conv(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
