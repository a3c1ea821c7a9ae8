"""Remaining image-processing utilities.

Reference: python_util/image_processing/{image_binarizer, morphology,
white_space_detection, shape_to_mask, image_stats, image_resizer}.py. The
bulk ops (binarization, morphology, resize) run on device via
citlab_as_tpu.ops; these wrappers provide the reference's calling
conventions on top.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.binarize import otsu_threshold
from citlab_as_tpu.ops.morphology import dilate, erode, morph_close, morph_open
from citlab_as_tpu.ops.resize import resize_image


def get_binarization(image, show_binarized_image: bool = False) -> np.ndarray:
    """Otsu binarization with black=1, white=0 (image_binarizer.py:11-34).
    Accepts an image path or a grayscale array."""
    if isinstance(image, str):
        from citlab_as_tpu.utils.io import load_image
        image = load_image(image, mode="L")
    _, binary = otsu_threshold(jnp.asarray(image, jnp.float32))
    # otsu: foreground (>t) = 255 = white -> invert to black=1
    return (np.asarray(binary) == 0).astype(int)


def is_whitespace(binarized_image: np.ndarray, rectangle,
                  threshold: float = 0.05) -> bool:
    """Whitespace test of a rect region of a black=1 binarized image
    (white_space_detection.py:33-53)."""
    crop = binarized_image[rectangle.y:rectangle.y + rectangle.height + 1,
                           rectangle.x:rectangle.x + rectangle.width + 1]
    n = (rectangle.height + 1) * (rectangle.width + 1)
    return float(np.sum(crop)) / n < threshold


def apply_transform(img: np.ndarray, transform_type: Optional[str] = None,
                    kernel_size: Tuple[int, int] = (4, 4),
                    kernel_type: str = "rect", iterations: int = 1) -> np.ndarray:
    """Morphological transform dispatcher (morphology.py:5-45, incl. the
    MORPH_ELLIPSE/MORPH_CROSS kernel types of morphology.py:30). Rect
    kernels run on device via reduce_window; ellipse/cross via the masked
    shifted-slice ops (cv2-parity tests in tests/test_ops.py)."""
    if kernel_type == "rect":
        _erode = erode
        _dilate = dilate
        _open = morph_open
        _close = morph_close
    elif kernel_type in ("ellipse", "cross"):
        from functools import partial

        from citlab_as_tpu.ops.morphology import (
            dilate_masked, erode_masked, morph_close_masked,
            morph_open_masked)
        _erode = partial(erode_masked, kind=kernel_type)
        _dilate = partial(dilate_masked, kind=kernel_type)
        _open = partial(morph_open_masked, kind=kernel_type)
        _close = partial(morph_close_masked, kind=kernel_type)
    else:
        raise ValueError(f"Unknown kernel_type '{kernel_type}'")
    kw, kh = kernel_size
    x = jnp.asarray(img, jnp.float32)
    for _ in range(max(1, iterations)):
        if transform_type == "erosion":
            x = _erode(x, kw, kh)
        elif transform_type == "dilation":
            x = _dilate(x, kw, kh)
        elif transform_type == "opening":
            x = _open(x, kw, kh)
        elif transform_type == "closing":
            x = _close(x, kw, kh)
        elif transform_type == "gradient":
            x = _dilate(x, kw, kh) - _erode(x, kw, kh)
        elif transform_type == "tophat":
            x = jnp.asarray(img, jnp.float32) - _open(x, kw, kh)
        elif transform_type == "blackhat":
            x = _close(x, kw, kh) - jnp.asarray(img, jnp.float32)
        else:
            raise ValueError(f"Unknown transform_type '{transform_type}'")
    return np.asarray(x).astype(np.asarray(img).dtype)


def shape_to_mask(img_shape, points, shape_type: Optional[str] = None,
                  line_width: int = 10, point_size: int = 5,
                  dtype=bool) -> np.ndarray:
    """Rasterize a labeled shape into a binary mask (shape_to_mask.py:6-34)."""
    from PIL import Image, ImageDraw
    mask = Image.fromarray(np.zeros(img_shape[:2], dtype=np.uint8))
    draw = ImageDraw.Draw(mask)
    xy = [tuple(p) for p in points]
    if shape_type == "circle":
        assert len(xy) == 2, "circle needs 2 points"
        (cx, cy), (px, py) = xy
        d = math.sqrt((cx - px) ** 2 + (cy - py) ** 2)
        draw.ellipse([cx - d, cy - d, cx + d, cy + d], outline=1, fill=1)
    elif shape_type == "rectangle":
        assert len(xy) == 2, "rectangle needs 2 points"
        draw.rectangle(xy, outline=1, fill=1)
    elif shape_type in ("line", "linestrip"):
        if shape_type == "line":
            assert len(xy) == 2, "line needs 2 points"
        draw.line(xy=xy, fill=1, width=line_width)
    elif shape_type == "point":
        assert len(xy) == 1, "point needs 1 point"
        cx, cy = xy[0]
        draw.ellipse([cx - point_size, cy - point_size,
                      cx + point_size, cy + point_size], outline=1, fill=1)
    else:
        assert len(xy) > 2, "polygon needs more than 2 points"
        draw.polygon(xy=xy, outline=1, fill=1)
    return np.array(mask, dtype=dtype)


def get_rotation_angle(image: np.ndarray, delta: float = 0.1,
                       limit: float = 2.0) -> Tuple[float, float]:
    """Projection-profile deskew (image_stats.py:32-48): best (score, angle)
    over [-limit, limit] in steps of delta by maximizing the squared
    differences of the horizontal projection histogram."""
    from scipy.ndimage import rotate

    def score_of(angle):
        data = rotate(image, angle, reshape=False, order=0)
        hist = np.sum(data, axis=1)
        return float(np.sum((hist[1:] - hist[:-1]) ** 2))

    angles = np.arange(-limit, limit + delta, delta)
    scores = [score_of(a) for a in angles]
    best = int(np.argmax(scores))
    return scores[best], float(angles[best])


def resize_image_ratio(image: np.ndarray, min_dimension: int = 600,
                       max_dimension: int = 1024,
                       pad_to_max_dimension: bool = False) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Ratio-preserving min/max resize (image_resizer.py:111-168): scale so
    the smaller side reaches min_dimension unless the larger side would
    exceed max_dimension (then cap by the larger side); optional zero pad to
    a max_dimension square. Returns (image, (new_h, new_w))."""
    h, w = image.shape[:2]
    small, large = min(h, w), max(h, w)
    scale = min_dimension / small
    if large * scale > max_dimension:
        scale = max_dimension / large
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    out = np.asarray(resize_image(image, new_h, new_w))
    if pad_to_max_dimension:
        pad_shape = (max_dimension, max_dimension) + out.shape[2:]
        padded = np.zeros(pad_shape, out.dtype)
        padded[:new_h, :new_w] = out
        out = padded
    return out, (new_h, new_w)


class ImageResizer:
    """Batch image resizer (image_resizer.py:1-236): holds a list of images
    (paths or arrays), resizes them all by a fixed scaling factor or via
    :func:`resize_image_ratio`, caching the results.

    The reference's TF ``resize_image_ratio`` path feeds the GNN visual
    branch; here the same contract is exposed for host-side preprocessing
    before device transfer.
    """

    def __init__(self, images=None, scaling_factor: float = 1.0):
        self._images = []
        if images:
            for image in images:
                self._images.append(self._load(image))
        self.scaling_factor = float(scaling_factor)
        self._resized = None

    @staticmethod
    def _load(image):
        if isinstance(image, str):
            from PIL import Image
            return np.asarray(Image.open(image).convert("L"), np.float32)
        return np.asarray(image)

    def add_image(self, image):
        self._images.append(self._load(image))
        self._resized = None

    @property
    def images(self):
        return self._images

    def resize(self):
        """Scale every image by ``scaling_factor`` (rounded dims)."""
        if self._resized is None:
            out = []
            for image in self._images:
                h = max(1, int(round(image.shape[0] * self.scaling_factor)))
                w = max(1, int(round(image.shape[1] * self.scaling_factor)))
                out.append(np.asarray(resize_image(image, h, w)))
            self._resized = out
        return self._resized

    def resize_ratio(self, min_dimension: int = 600,
                     max_dimension: int = 1024,
                     pad_to_max_dimension: bool = False):
        """Apply :func:`resize_image_ratio` to every image; returns
        (images, true_shapes) ready for batching into the visual branch."""
        outs, shapes = [], []
        for image in self._images:
            out, shape = resize_image_ratio(
                image, min_dimension, max_dimension, pad_to_max_dimension)
            outs.append(out)
            shapes.append(shape)
        return outs, shapes
