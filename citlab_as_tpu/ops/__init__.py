"""Device image ops (JAX/XLA, TPU-first).

Replaces the reference's OpenCV/rasterio host pipeline for the bulk-numeric
work: resize, Gaussian blur + Otsu binarization, rect-kernel morphology,
Euclidean distance transform (jump flooding), connected-component labeling
and stats (run-propagation + segment reductions). Irregular-output contour
tracing stays on host (:mod:`citlab_as_tpu.ops.contours`).
"""
from citlab_as_tpu.ops.resize import get_scaling_factor, scale_image, resize_image
from citlab_as_tpu.ops.binarize import gaussian_blur, otsu_threshold, otsu_binarize
from citlab_as_tpu.ops.morphology import erode, dilate, morph_open, morph_close
from citlab_as_tpu.ops.distance_transform import distance_transform_edt
from citlab_as_tpu.ops.connected_components import (
    connected_components, cc_stats, remove_small_components,
)

__all__ = [
    "get_scaling_factor", "scale_image", "resize_image",
    "gaussian_blur", "otsu_threshold", "otsu_binarize",
    "erode", "dilate", "morph_open", "morph_close",
    "distance_transform_edt",
    "connected_components", "cc_stats", "remove_small_components",
]
