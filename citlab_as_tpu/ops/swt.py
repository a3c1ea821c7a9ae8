"""Stroke-width distance transform (SWT).

Reference: python_util/image_processing/swt_dist_trafo.py:5-104. The heavy
part — invert, Gaussian+Otsu binarization, Euclidean distance transform —
runs on device (:mod:`citlab_as_tpu.ops`); the per-text-line connected
component statistics over small bbox crops are irregular host work
(scipy label over ~100x1000 px crops, mirroring the reference's per-crop
cv2.connectedComponentsWithStats semantics).
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from citlab_as_tpu.ops.binarize import otsu_binarize
from citlab_as_tpu.ops.distance_transform import distance_transform_edt

_EIGHT = np.ones((3, 3), dtype=np.int8)


class StrokeWidthDistanceTransform:
    """SWT feature extractor: distance-transform image + cleaned CC stats."""

    # process-wide DT memo: the heading and GNN-feature stages both need the
    # full-resolution distance transform of the same page image; the second
    # computation is pure waste (~140 ms/page). Keyed by caller-supplied
    # cache_key (image path) + polarity; bounded LRU.
    _DT_CACHE: "OrderedDict" = None
    _DT_CACHE_MAX = 16

    def __init__(self, dark_on_bright: bool = True, clean_ccs: int = 2,
                 on_device: bool = False):
        self._dark_on_bright = dark_on_bright
        self._clean_ccs = clean_ccs
        self._on_device = on_device
        if StrokeWidthDistanceTransform._DT_CACHE is None:
            from collections import OrderedDict
            StrokeWidthDistanceTransform._DT_CACHE = OrderedDict()

    # ---------------- device path ----------------
    def distance_transform(self, image: np.ndarray,
                           cache_key: str = None) -> np.ndarray:
        """Grayscale image -> uint8 distance-transform image (swt:18-24).
        Values are clipped at 255 rather than wrapped (deviation from the
        reference's bare uint8 cast, which overflows on large blank areas).
        ``cache_key`` (e.g. the image path) memoizes the result across
        pipeline stages."""
        import jax

        cache = StrokeWidthDistanceTransform._DT_CACHE
        key = (cache_key, self._dark_on_bright) if cache_key else None
        if key is not None and key in cache:
            cache.move_to_end(key)
            return cache[key]

        img = np.asarray(image)
        if img.ndim == 3:
            img = img[..., 0]
        if self._dark_on_bright:
            img = 255 - img.astype(np.int32)
        if not self._on_device or jax.default_backend() == "cpu":
            # host fast path: the DT's only consumers are host-side per-crop
            # CC analyses (scipy label), so the full-res result must land on
            # the host either way; scipy's C blur/EDT avoids the full-res
            # upload+download round trip entirely (the device variant remains
            # available via on_device=True for device-resident consumers)
            from citlab_as_tpu.ops.binarize import otsu_binarize_host
            _, binary = otsu_binarize_host(img.astype(np.float32), blur_ksize=5)
            dist = ndi.distance_transform_edt(binary != 0)
            dist = np.minimum(dist, 255.0)
        else:
            _, binary = otsu_binarize(jnp.asarray(img.astype(np.float32)),
                                      blur_ksize=5)
            dist = np.asarray(distance_transform_edt(binary, cap=255.0))
        out = dist.astype(np.uint8)
        if key is not None:
            cache[key] = out
            while len(cache) > StrokeWidthDistanceTransform._DT_CACHE_MAX:
                cache.popitem(last=False)
        return out

    def distance_transform_from_file(self, img_file: str) -> np.ndarray:
        from citlab_as_tpu.utils.io import load_image
        return self.distance_transform(load_image(img_file, mode="L"))

    def apply_swt_dist_trafo(self, image: np.ndarray):
        swt = self.distance_transform(image)
        ccs = self.connected_components(swt)
        return swt, self.clean_connected_components(ccs)

    # ---------------- host crop path ----------------
    @staticmethod
    def connected_components(image: np.ndarray) -> List[Tuple[int, int, int, int]]:
        """(x, y, w, h) bboxes of the 8-connected nonzero components
        (swt:31-42, background skipped)."""
        mask = np.asarray(image) != 0
        if not mask.any():
            return []
        labels, n = ndi.label(mask, structure=_EIGHT)
        slices = ndi.find_objects(labels)
        out = []
        for sl in slices:
            if sl is None:
                continue
            ys, xs = sl
            out.append((int(xs.start), int(ys.start),
                        int(xs.stop - xs.start), int(ys.stop - ys.start)))
        return out

    def clean_connected_components(self, components):
        """Reject tiny/huge components and extreme aspect ratios (swt:44-66)."""
        out = []
        for x, y, w, h in components:
            if self._clean_ccs > 0 and (w < 3 or h < 3 or h > 500 or w > 500):
                continue
            if self._clean_ccs > 1 and (w / h > 8 or h / w > 8):
                continue
            out.append((x, y, w, h))
        return out

    # ---------------- per-text-line features ----------------
    def textline_features(self, swt_image: np.ndarray, bbox) -> Tuple[float, int]:
        """(stroke_width, text_height) for one text line bbox: median of the
        per-CC max distance values and max CC height inside the crop
        (heading_net_post_processor.py:218-245 / swt __main__:84-104)."""
        x, y, w, h = bbox
        crop = swt_image[y:y + h + 1, x:x + w + 1]
        ccs = self.clean_connected_components(self.connected_components(crop))
        swt_values = []
        text_height = 0
        for cx, cy, cw, ch in ccs:
            swt_values.append(np.max(crop[cy:cy + ch, cx:cx + cw]))
            text_height = max(text_height, ch)
        stroke_width = float(np.median(swt_values)) if swt_values else 0.0
        return stroke_width, text_height
