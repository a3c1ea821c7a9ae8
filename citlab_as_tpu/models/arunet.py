"""ARU-Net in JAX/flax — the segmentation backbone of the separator and
heading detection stages.

Architecture reconstructed from the reference training code
(article_separation/backbones/ARU_v1.py:35-294, layer semantics from
gnn/model/graph_util/layers.py:191-368,716-720); this is the net inside
separator_detection_net.pb / heading_detection_net.pb (nets/README.md:3-7):

- detCNN: a residual U-Net. ``scale_space_num`` (5) scales down, each a
  residual block (identity conv -> relu -> res_depth(3) convs -> skip add ->
  relu) with feature counts featRoot(8) * 2^scale, 2x2 max pool between
  scales; up path mirrors with stride-2 transposed conv, skip concat and the
  same residual block.
- ARU adds a scale pyramid: the shared detCNN also runs on 2x and 4x
  avg-pooled inputs; a small shared attention CNN (4 conv+pool stages to a
  1-channel map at 1/8 resolution) scores each scale; per-pixel softmax over
  the ``num_scales_att``(3) attention maps weights the upsampled det maps.
- logits: final 4x4 conv to n_classes.

Faithfully kept quirk: the reference upsamples via conv2d_transpose with an
all-ones [up, up, C, C] filter (layers.py:716-720), which SUMS across input
channels and broadcasts the sum to every output channel. The frozen nets
were trained with this, so we replicate it (``_upsample_sum``).

TPU notes: NHWC layout, optional bfloat16 compute with float32 params,
SAME padding throughout; deconv outputs are cropped to the skip's shape so
arbitrary input sizes work (inputs padded to multiples of
2^(scale_space_num-1) upstream avoid the crop entirely).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

DEFAULT_GRAPH_PARAMS: Dict[str, Any] = {
    "graph": "ARU",          # U | RU | ARU  (reference default 'RU'; nets are ARU)
    "mvn": False,             # per-image standardization of inputs
    "featRoot": 8,
    "num_scales_att": 3,
    "scale_space_num": 5,
    "res_depth": 3,
    "filter_size": 3,
    "pool_size": 2,
    "activation_name": "relu",
}


def _activation(name: str):
    return {"relu": nn.relu, "elu": nn.elu, "leaky": nn.leaky_relu}[name]


def per_image_standardization(image: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / adjusted_stddev per image (layers.py:671-713)."""
    mean = jnp.mean(image)
    n = image.size
    stddev = jnp.std(image)
    adjusted = jnp.maximum(stddev, 1.0 / jnp.sqrt(jnp.float32(n)))
    return (image - mean) / adjusted


def _conv_init(kh: int, kw: int, cin: int, cout: int):
    """initOpt=0 of layers.conv2d: normal(stddev=sqrt(2/(kh*kw*cin+cout)))."""
    stddev = np.sqrt(2.0 / (kh * kw * cin + cout))
    return nn.initializers.normal(stddev=stddev)


# When True, 3x3 convs with <= 32 output channels route through the Pallas
# packed-matmul kernel (ops/pallas/conv3x3.py) instead of XLA's conv, which
# underfills the MXU at low channel counts (measured 2-8 TF/s vs ~110 TF/s
# matmul peak on v5e). Same params, same math (f32 accumulation); results
# agree with XLA to bf16 rounding. TPU-only — leave False on CPU backends.
USE_MXU_CONV = False
_MXU_CONV_COUT = (8, 16, 32)


def set_mxu_conv(enabled: bool) -> None:
    global USE_MXU_CONV
    USE_MXU_CONV = bool(enabled)


class _PallasConv(nn.Module):
    """Param-tree-compatible stand-in for nn.Conv (same 'kernel'/'bias'
    leaves) computing via the Pallas packed-matmul kernel."""
    features: int
    kernel_size: int
    kernel_init: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from citlab_as_tpu.ops.pallas.conv3x3 import conv3x3_mxu
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kernel_size, self.kernel_size, cin, self.features))
        bias = self.param("bias", nn.initializers.constant(0.1),
                          (self.features,))
        x = x.astype(self.dtype)
        return conv3x3_mxu(x, kernel.astype(self.dtype),
                           bias.astype(self.dtype))


class _Conv(nn.Module):
    """conv2d of layers.py:191-258: SAME conv + bias(0.1) + activation."""
    features: int
    kernel: int
    act: Optional[Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = _conv_init(self.kernel, self.kernel, cin, self.features)
        if (USE_MXU_CONV and self.kernel == 3
                and self.features in _MXU_CONV_COUT and cin >= 8):
            # cin >= 8: the packed reshape needs P*cin lanes to tile well;
            # the 1-channel input conv is contraction-9 and cheap anyway
            y = _PallasConv(self.features, self.kernel, init,
                            dtype=self.dtype, name="conv")(x)
        else:
            y = nn.Conv(
                self.features, (self.kernel, self.kernel), padding="SAME",
                kernel_init=init,
                bias_init=nn.initializers.constant(0.1),
                dtype=self.dtype, name="conv",
            )(x)
        return self.act(y) if self.act is not None else y


class _ResBlock(nn.Module):
    """Residual block of _detCNN (ARU_v1.py:210-231): identity conv ->
    relu -> res_depth convs (last identity) -> +skip -> activation."""
    features: int
    res_depth: int
    filter_size: int
    act: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _Conv(self.features, self.filter_size, None, self.dtype, name="conv1")(x)
        orig = x
        x = nn.relu(x)
        if self.res_depth == 0:
            # ARU_v1.py:216/ARU_cutted_v1.py:54: the residual add and final
            # activation are guarded by res_depth > 0
            return x
        for i in range(self.res_depth):
            act = self.act if i < self.res_depth - 1 else None
            x = _Conv(self.features, self.filter_size, act, self.dtype,
                      name=f"convR_{i}")(x)
        return self.act(x + orig)


class _PlainBlock(nn.Module):
    """Two plain convs (U variant, ARU_v1.py:232-238)."""
    features: int
    filter_size: int
    act: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _Conv(self.features, self.filter_size, self.act, self.dtype, name="conv1")(x)
        return _Conv(self.features, self.filter_size, self.act, self.dtype, name="conv2")(x)


class _Deconv(nn.Module):
    """deconv2d of layers.py:342-368: stride-2 transposed conv + bias + act,
    output cropped to ``target_hw``."""
    features: int
    filter_size: int
    stride: int
    act: Any
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, target_hw):
        cin = x.shape[-1]
        y = nn.ConvTranspose(
            self.features, (self.filter_size, self.filter_size),
            strides=(self.stride, self.stride), padding="SAME",
            kernel_init=_conv_init(self.filter_size, self.filter_size, self.features, cin),
            bias_init=nn.initializers.constant(0.1),
            dtype=self.dtype, name="deconv",
        )(x)
        y = y[:, :target_hw[0], :target_hw[1], :]
        return self.act(y)


def _max_pool(x, k: int):
    return nn.max_pool(x, (k, k), strides=(k, k), padding="SAME")


def _avg_pool(x, k: int):
    return nn.avg_pool(x, (k, k), strides=(k, k), padding="SAME")


def _upsample_sum(x: jnp.ndarray, up: int, out_hw: Tuple[int, int],
                  out_channels: int) -> jnp.ndarray:
    """conv2d_transpose with an all-ones [up, up, C, C] filter
    (layers.py:716-720): sum input channels, repeat the sum up x up, and
    broadcast to ``out_channels``. Cropped to ``out_hw``."""
    summed = jnp.sum(x, axis=-1, keepdims=True)
    y = jnp.repeat(jnp.repeat(summed, up, axis=1), up, axis=2)
    y = y[:, :out_hw[0], :out_hw[1], :]
    return jnp.broadcast_to(y, y.shape[:3] + (out_channels,))


class _DetCNN(nn.Module):
    """Residual U-Net (ARU_v1.py:186-294). Returns the featRoot-channel map."""
    graph_params: Dict[str, Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, end_points=None, sc: int = 0):
        gp = self.graph_params
        act = _activation(gp["activation_name"])
        use_residual = "RU" in gp["graph"]
        pool = gp["pool_size"]
        n_scales = gp["scale_space_num"]
        feat = gp["featRoot"]
        skips = []
        feats = []
        for layer in range(n_scales):
            block_cls = _ResBlock if use_residual else _PlainBlock
            if use_residual:
                block = _ResBlock(feat, gp["res_depth"], gp["filter_size"], act,
                                  self.dtype, name=f"unet_down_{layer}")
            else:
                block = _PlainBlock(feat, gp["filter_size"], act, self.dtype,
                                    name=f"unet_down_{layer}")
            x = block(x)
            if end_points is not None:
                end_points[f"scale_{sc}_unet_down_{layer}_conv"] = x
            skips.append(x)
            feats.append(feat)
            if layer < n_scales - 1:
                x = _max_pool(x, pool)
                if end_points is not None:
                    end_points[f"scale_{sc}_unet_down_{layer}_maxpool"] = x
            feat *= pool

        for layer in range(n_scales - 2, -1, -1):
            skip = skips[layer]
            up_feat = feats[layer]
            deconv = _Deconv(up_feat, gp["filter_size"], pool, act, self.dtype,
                             name=f"unet_up_{layer}_deconv")(x, skip.shape[1:3])
            if end_points is not None:
                end_points[f"scale_{sc}_unet_up_{layer}_deconv"] = deconv
            x = jnp.concatenate([skip, deconv], axis=3)
            if use_residual:
                x = _ResBlock(up_feat, gp["res_depth"], gp["filter_size"], act,
                              self.dtype, name=f"unet_up_{layer}")(x)
            else:
                x = _PlainBlock(up_feat, gp["filter_size"], act, self.dtype,
                                name=f"unet_up_{layer}")(x)
            if end_points is not None:
                end_points[f"scale_{sc}_unet_up_{layer}_conv"] = x
        return x


class _AttCNN(nn.Module):
    """Attention net (ARU_v1.py:165-184): 4x [4x4 conv + 2x2 pool] down to a
    1-channel score map at 1/8 resolution."""
    graph_params: Dict[str, Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _activation(self.graph_params["activation_name"])
        x = _Conv(12, 4, act, self.dtype, name="conv1")(x)
        x = _max_pool(x, 2)
        x = _Conv(16, 4, act, self.dtype, name="conv2")(x)
        x = _max_pool(x, 2)
        x = _Conv(32, 4, act, self.dtype, name="conv3")(x)
        x = _max_pool(x, 2)
        return _Conv(1, 4, act, self.dtype, name="conv4")(x)


class ARUNet(nn.Module):
    """Full ARU / RU / U pixel labeler (ARU_v1.py:62-163).

    Call with NHWC float input in [0, 1]; returns (logits, end_points).
    ``predict`` applies the channel softmax, matching the frozen nets'
    ``output:0`` contract (inImg:0 [B,H,W,1] grayscale/255 ->
    probabilities [B,H,W,n_classes], net_post_processing_helper.py:56-72).
    """
    n_classes: int = 2
    graph_params: Optional[Dict[str, Any]] = None
    dtype: Dtype = jnp.float32

    def _gp(self) -> Dict[str, Any]:
        gp = dict(DEFAULT_GRAPH_PARAMS)
        if self.graph_params:
            gp.update(self.graph_params)
        return gp

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        gp = self._gp()
        use_attention = "ARU" in gp["graph"]
        end_points: Dict[str, Any] = {}

        x = inputs.astype(self.dtype)
        if gp["mvn"]:
            x = jax.vmap(per_image_standardization)(x)

        h, w = x.shape[1], x.shape[2]
        feat_root = gp["featRoot"]

        det = _DetCNN(gp, self.dtype, name="featMapG")
        out_det = {0: det(x, end_points, sc=0)}

        if use_attention:
            att = _AttCNN(gp, self.dtype, name="attMapG")
            inp_scale = {0: x}
            for sc in range(1, gp["num_scales_att"]):
                inp_scale[sc] = _avg_pool(inp_scale[sc - 1], 2)

            out_att = {}
            up_sc = 8
            for sc in range(gp["num_scales_att"]):
                a = att(inp_scale[sc])
                out_att[sc] = _upsample_sum(a, up_sc, (h, w), 1)
                up_sc *= 2

            up_sc = 1
            for sc in range(1, gp["num_scales_att"]):
                out_s = det(inp_scale[sc], end_points, sc=sc)
                up_sc *= 2
                out_det[sc] = _upsample_sum(out_s, up_sc, (h, w), feat_root)

            all_att = jnp.concatenate(
                [out_att[sc] for sc in range(gp["num_scales_att"])], axis=3)
            att_w = jax.nn.softmax(all_att, axis=3)
            fmap = sum(
                out_det[sc] * att_w[..., sc:sc + 1]
                for sc in range(gp["num_scales_att"]))
            end_points["sum_att_feat_map"] = fmap
        else:
            fmap = out_det[0]

        logits = _Conv(self.n_classes, 4, None, self.dtype, name="logit")(fmap)
        logits = logits.astype(jnp.float32)
        end_points["logits"] = logits
        return logits, end_points

    def predict(self, variables, inputs) -> jnp.ndarray:
        """Probability maps [B, H, W, n_classes] (the ``output:0`` contract)."""
        logits, _ = self.apply(variables, inputs)
        return jax.nn.softmax(logits, axis=-1)


def pad_to_multiple(image: jnp.ndarray, multiple: int = 16):
    """Pad H/W of an NHWC batch up to a multiple (zeros), returning the
    padded batch and original (h, w) for cropping the output back. Keeps
    every pool/deconv shape exact so XLA sees one static shape per bucket."""
    h, w = image.shape[1], image.shape[2]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph or pw:
        image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return image, (h, w)


ARU_CUTTED_GRAPH_PARAMS: Dict[str, Any] = {
    "mvn": True,              # reference default for the cutted extractor
    "featRoot": 12,
    "num_scales_att": 3,      # unused (no attention net), kept for parity
    "scale_space_num": 6,
    "res_depth": 0,
    "filter_size": 3,
    "pool_size": 2,
    "activation_name": "relu",
}


class ARUCutted(nn.Module):
    """Down-path-only ARU feature extractor (ARU_cutted_v1.py:7-73): per
    scale one conv1 (+ optional residual chain) then 2x2 max-pool, feature
    count doubling per scale; no attention pyramid, no up path. Used as the
    GNN visual backbone when only multi-resolution down-path features are
    needed — a full ARU forward would waste the entire up-path compute.

    Returns ``(deepest_map, endpoints)`` with ``endpoints['res_block_i']``
    holding each scale's pre-pool activation (the reference returns ``{}``;
    exposing the per-scale maps lets MultiResolutionFeatureMaps select
    intermediate resolutions).
    """
    graph_params: Optional[Dict[str, Any]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        gp = dict(ARU_CUTTED_GRAPH_PARAMS)
        if self.graph_params:
            gp.update(self.graph_params)
        act = _activation(gp["activation_name"])
        if gp["mvn"]:
            x = jax.vmap(per_image_standardization)(x)
        feat = gp["featRoot"]
        pool = gp["pool_size"]
        end_points: Dict[str, jnp.ndarray] = {}
        for layer in range(gp["scale_space_num"]):
            x = _ResBlock(feat, gp["res_depth"], gp["filter_size"], act,
                          self.dtype, name=f"res_block_{layer}")(x)
            end_points[f"res_block_{layer}"] = x
            if layer < gp["scale_space_num"] - 1:
                x = _max_pool(x, pool)
            feat *= pool
        return x, end_points
