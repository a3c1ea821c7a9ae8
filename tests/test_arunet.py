"""ARU-Net structure tests: shapes, parameter counts, scale sharing, variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from citlab_as_tpu.models.arunet import ARUNet, pad_to_multiple, _upsample_sum
from citlab_as_tpu.models.backbones import get_backbone


@pytest.fixture(scope="module")
def small_params():
    # tiny config for fast CI: 3 scales, res_depth 2, featRoot 4
    return {"graph": "ARU", "featRoot": 4, "scale_space_num": 3,
            "res_depth": 2, "num_scales_att": 3}


def test_forward_shapes(small_params):
    model = ARUNet(n_classes=2, graph_params=small_params)
    x = jnp.zeros((1, 64, 96, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, eps = model.apply(variables, x)
    assert logits.shape == (1, 64, 96, 2)
    assert "sum_att_feat_map" in eps
    assert eps["sum_att_feat_map"].shape == (1, 64, 96, 4)
    # down path endpoints present for each scale of the pyramid
    assert "scale_0_unet_down_0_conv" in eps
    assert "scale_2_unet_down_0_conv" in eps


def test_predict_is_softmax(small_params):
    model = ARUNet(n_classes=2, graph_params=small_params)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    probs = model.predict(variables, x)
    assert probs.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_det_and_att_shared_across_scales(small_params):
    model = ARUNet(n_classes=2, graph_params=small_params)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    # exactly one detCNN and one attCNN parameter tree (scale sharing)
    assert "featMapG" in params and "attMapG" in params
    det_names = [k for k in params if k.startswith("featMapG")]
    assert len(det_names) == 1


def test_ru_variant_no_attention():
    model = ARUNet(n_classes=2, graph_params={
        "graph": "RU", "featRoot": 4, "scale_space_num": 3, "res_depth": 2})
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, eps = model.apply(variables, x)
    assert logits.shape == (1, 32, 32, 2)
    assert "attMapG" not in variables["params"]
    assert "sum_att_feat_map" not in eps


def test_u_variant_plain_blocks():
    model = ARUNet(n_classes=2, graph_params={
        "graph": "U", "featRoot": 4, "scale_space_num": 3})
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x)
    assert logits.shape == (1, 32, 32, 2)


def test_channel_progression_full_config():
    # full reference config: featRoot 8, 5 scales -> down channels 8..128
    model = ARUNet(n_classes=2)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, eps = model.apply(variables, x)
    for layer, ch in enumerate([8, 16, 32, 64, 128]):
        assert eps[f"scale_0_unet_down_{layer}_conv"].shape[-1] == ch
    for layer, ch in enumerate([8, 16, 32, 64]):
        assert eps[f"scale_0_unet_up_{layer}_conv"].shape[-1] == ch


def test_upsample_sum_quirk():
    # replicates conv2d_transpose with ones [up,up,C,C] filter: channel sum,
    # blocky upsample, broadcast
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2))
    y = _upsample_sum(x, 2, (4, 4), 3)
    assert y.shape == (1, 4, 4, 3)
    # top-left block = sum of channels of x[0,0,0] = 0+1
    assert float(y[0, 0, 0, 0]) == 1.0
    assert float(y[0, 1, 1, 2]) == 1.0
    assert float(y[0, 3, 3, 0]) == 13.0  # 6+7


def test_pad_to_multiple():
    x = jnp.zeros((1, 30, 45, 1))
    padded, (h, w) = pad_to_multiple(x, 16)
    assert padded.shape == (1, 32, 48, 1)
    assert (h, w) == (30, 45)


def test_odd_input_sizes(small_params):
    # deconv cropping must handle non-multiple-of-2^k inputs
    model = ARUNet(n_classes=2, graph_params=small_params)
    x = jnp.zeros((1, 37, 53, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x)
    assert logits.shape == (1, 37, 53, 2)


def test_backbone_dispatcher():
    m = get_backbone("RU_v2", n_classes=3)
    assert m.n_classes == 3
    assert m.graph_params["graph"] == "RU"
    with pytest.raises(ValueError):
        get_backbone("nope")


def test_bf16_compute():
    model = ARUNet(n_classes=2, dtype=jnp.bfloat16, graph_params={
        "graph": "ARU", "featRoot": 4, "scale_space_num": 3, "res_depth": 2})
    x = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x)
    assert logits.dtype == jnp.float32  # logits promoted back to f32
