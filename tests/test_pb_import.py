"""Frozen-graph importer tests with hand-encoded protobuf wire bytes."""
import struct

import numpy as np
import pytest

from citlab_as_tpu.models.pb_import import (
    _tf_to_flax_name, import_arunet_weights, load_pb_constants, parse_message,
)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_proto(arr: np.ndarray) -> bytes:
    dtype_map = {np.dtype(np.float32): 1, np.dtype(np.int32): 3}
    out = _field(1, 0, _varint(dtype_map[arr.dtype]))
    shape = b""
    for dim in arr.shape:
        shape += _len_field(2, _field(1, 0, _varint(dim)))
    out += _len_field(2, shape)
    out += _len_field(4, arr.tobytes())
    return out


def _const_node(name: str, arr: np.ndarray) -> bytes:
    attr_value = _len_field(8, _tensor_proto(arr))  # AttrValue.tensor
    attr_entry = _len_field(1, b"value") + _len_field(2, attr_value)
    node = (_len_field(1, name.encode())
            + _len_field(2, b"Const")
            + _len_field(5, attr_entry))
    return _len_field(1, node)  # GraphDef.node


def test_parse_message_roundtrip():
    buf = _field(1, 0, _varint(300)) + _len_field(2, b"abc")
    msg = parse_message(buf)
    assert msg[1][0][1] == 300
    assert msg[2][0][1] == b"abc"


def test_load_pb_constants():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.asarray([1, 2, 3], np.int32)
    graph = _const_node("layer/weights", w) + _const_node("layer/shape", b)
    consts = load_pb_constants(graph)
    assert set(consts) == {"layer/weights", "layer/shape"}
    np.testing.assert_array_equal(consts["layer/weights"], w)
    np.testing.assert_array_equal(consts["layer/shape"], b)


def test_tf_name_mapping():
    assert _tf_to_flax_name("aru_net/featMapG/unet_down_0/conv1/weights") == \
        "params/featMapG/unet_down_0/conv1/conv/kernel"
    assert _tf_to_flax_name("aru_net/featMapG/unet_down_2/convR_1/biases") == \
        "params/featMapG/unet_down_2/convR_1/conv/bias"
    assert _tf_to_flax_name("aru_net/featMapG/unet_up_3/deconv/weights") == \
        "params/featMapG/unet_up_3_deconv/deconv/kernel"
    assert _tf_to_flax_name("aru_net/attMapG/attPart/conv2/weights") == \
        "params/attMapG/conv2/conv/kernel"
    assert _tf_to_flax_name("aru_net/logit/class/biases") == \
        "params/logit/conv/bias"
    assert _tf_to_flax_name("some/unrelated/node") is None


def test_deconv_kernel_conversion_matches_tf_semantics():
    """flip(h,w)+swap(in,out) of a TF [k,k,out,in] deconv kernel reproduces
    gradient-of-conv (tf.nn.conv2d_transpose) outputs through flax
    ConvTranspose (transpose_kernel=False)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
    k_tf = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)  # [k,k,out,in]
    y_tf = lax.conv_transpose(
        x, k_tf, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    k_flax = k_tf[::-1, ::-1].transpose(0, 1, 3, 2)
    mod = nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="SAME")
    y_flax = mod.apply({"params": {"kernel": k_flax, "bias": jnp.zeros(4)}}, x)
    np.testing.assert_allclose(np.asarray(y_tf), np.asarray(y_flax), atol=1e-5)


def test_import_deconv_weights_transposed():
    """TF deconv consts ([k,k,out,in]) must land in the flax tree converted,
    not be silently dropped by the shape guard."""
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.arunet import ARUNet

    model = ARUNet(n_classes=2, graph_params={
        "graph": "RU", "featRoot": 4, "scale_space_num": 2, "res_depth": 1})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    flax_shape = np.asarray(
        variables["params"]["featMapG"]["unet_up_0_deconv"]["deconv"]["kernel"]
    ).shape  # (3, 3, in, out)
    k, _, cin, cout = flax_shape[0], flax_shape[1], flax_shape[2], flax_shape[3]
    w_tf = np.arange(k * k * cout * cin, dtype=np.float32).reshape(
        k, k, cout, cin)
    graph = _const_node("aru_net/featMapG/unet_up_0/deconv/weights", w_tf)

    new_vars, matched, unmatched = import_arunet_weights(graph, variables)
    assert "params/featMapG/unet_up_0_deconv/deconv/kernel" in matched
    got = np.asarray(
        new_vars["params"]["featMapG"]["unet_up_0_deconv"]["deconv"]["kernel"])
    np.testing.assert_array_equal(got, w_tf[::-1, ::-1].transpose(0, 1, 3, 2))


def test_import_strict_raises_on_shape_mismatch():
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.arunet import ARUNet

    model = ARUNet(n_classes=2, graph_params={
        "graph": "RU", "featRoot": 4, "scale_space_num": 2, "res_depth": 1})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    wrong = np.zeros((5, 5, 1, 1), np.float32)
    graph = _const_node("aru_net/featMapG/unet_down_0/conv1/weights", wrong)
    with pytest.raises(ValueError, match="shapes disagree"):
        import_arunet_weights(graph, variables)
    # non-strict keeps the old skip behavior
    _, matched, unmatched = import_arunet_weights(graph, variables, strict=False)
    assert matched == []
    assert "aru_net/featMapG/unet_down_0/conv1/weights" in unmatched


def test_import_arunet_weights_end_to_end():
    import jax
    import jax.numpy as jnp
    from citlab_as_tpu.models.arunet import ARUNet

    model = ARUNet(n_classes=2, graph_params={
        "graph": "RU", "featRoot": 4, "scale_space_num": 2, "res_depth": 1})
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    # build a synthetic frozen graph containing one matching weight
    kernel_shape = np.asarray(
        variables["params"]["featMapG"]["unet_down_0"]["conv1"]["conv"]["kernel"]
    ).shape
    w = np.full(kernel_shape, 0.123, np.float32)
    graph = _const_node("aru_net/featMapG/unet_down_0/conv1/weights", w)
    graph += _const_node("aru_net/unrelated", np.zeros(2, np.float32))

    new_vars, matched, unmatched = import_arunet_weights(graph, variables)
    assert "params/featMapG/unet_down_0/conv1/conv/kernel" in matched
    assert "aru_net/unrelated" in unmatched
    got = np.asarray(
        new_vars["params"]["featMapG"]["unet_down_0"]["conv1"]["conv"]["kernel"])
    assert np.allclose(got, 0.123)
    # untouched params keep values
    logits_b = np.asarray(new_vars["params"]["logit"]["conv"]["bias"])
    orig_b = np.asarray(variables["params"]["logit"]["conv"]["bias"])
    np.testing.assert_array_equal(logits_b, orig_b)
