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

    def __init__(self, dark_on_bright: bool = True, clean_ccs: int = 2):
        self._dark_on_bright = dark_on_bright
        self._clean_ccs = clean_ccs

    # ---------------- device path ----------------
    def distance_transform(self, image: np.ndarray) -> np.ndarray:
        """Grayscale image -> uint8 distance-transform image (swt:18-24).
        Values are clipped at 255 rather than wrapped (deviation from the
        reference's bare uint8 cast, which overflows on large blank areas)."""
        import jax

        img = np.asarray(image)
        if img.ndim == 3:
            img = img[..., 0]
        if self._dark_on_bright:
            img = 255 - img.astype(np.int32)
        if jax.default_backend() == "cpu":
            # host fast path: scipy's C blur/EDT beats tracing the device
            # kernels by ~30x when the active backend is the CPU anyway
            from citlab_as_tpu.ops.binarize import otsu_binarize_host
            _, binary = otsu_binarize_host(img.astype(np.float32), blur_ksize=5)
            dist = ndi.distance_transform_edt(binary != 0)
            dist = np.minimum(dist, 255.0)
        else:
            _, binary = otsu_binarize(jnp.asarray(img.astype(np.float32)),
                                      blur_ksize=5)
            dist = np.asarray(distance_transform_edt(binary, cap=255.0))
        return dist.astype(np.uint8)

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
