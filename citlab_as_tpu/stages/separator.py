"""Separator detection stage (pipeline stage 1).

Reference behavior: separator_net_post_processor.py:26-159 +
net_post_processing_helper.py:14-78. TPU-first split: everything bulk-numeric
(threshold, CC filter, h/v morphology) is one jitted device pipeline over the
ARU-Net probability map; only contour tracing and PAGE-XML writing run on
host.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from citlab_as_tpu.ops.connected_components import remove_small_components
from citlab_as_tpu.ops.morphology import morph_open
from citlab_as_tpu.ops.contours import trace_contours
from citlab_as_tpu.ops.resize import scale_image
from citlab_as_tpu.pagexml.constants import SEPARATORREGION
from citlab_as_tpu.stages.separator_writer import SeparatorRegionToPageWriter
from citlab_as_tpu.utils.io import get_page_path, load_image
from citlab_as_tpu.utils.logging import setup_custom_logger

logger = setup_custom_logger(__name__)


def apply_threshold(net_output: np.ndarray, threshold: float) -> np.ndarray:
    """uint8-aware binarization (net_post_processing_helper.py:75-78)."""
    if net_output.dtype == np.uint8:
        threshold = threshold * 255
    return np.asarray((net_output > threshold) * 255, dtype=np.uint8)


@partial(jax.jit, static_argnames=("h_kernel", "v_kernel", "noise_kernel"))
def _separator_masks_device(binary: jnp.ndarray, min_cc_size: jnp.ndarray,
                            h_kernel: int, v_kernel: int, noise_kernel: int):
    """Device part of post_process (separator_net_post_processor.py:33-97):
    CC filter -> horizontal/vertical openings -> subtract -> noise opening."""
    cleaned = remove_small_components(binary, min_cc_size).astype(jnp.float32)
    return _separator_morphology_device(cleaned, h_kernel, v_kernel,
                                        noise_kernel)


@partial(jax.jit, static_argnames=("h_kernel", "v_kernel", "noise_kernel"))
def _separator_morphology_device(cleaned: jnp.ndarray, h_kernel: int,
                                 v_kernel: int, noise_kernel: int):
    """Morphology-only tail of the pipeline (CC filtering done upstream)."""
    horizontal = morph_open(cleaned, h_kernel, 1)
    vertical = morph_open(cleaned, 1, v_kernel)
    horizontal = jnp.clip(horizontal - vertical, 0, 255)  # cv2.subtract saturates
    horizontal = morph_open(horizontal, noise_kernel, 1)
    return horizontal.astype(jnp.uint8), vertical.astype(jnp.uint8)


def make_fused_separator_fn(model):
    """Whole-stage device pipeline: original uint8 pages in, bit-packed
    separator masks out, in ONE jitted program.

    TPU-first rationale: over a thin host<->device link the per-page data
    movement dominates (resize round-trip + f32 probability readback +
    binary re-upload cost ~28 MB/page); fusing resize -> ARU forward ->
    quantize -> threshold -> CC filter -> h/v morphology on device and
    reading back 1-bit masks cuts it to ~2 MB/page. All crops are static
    (pages are grouped by identical original shape), so the result is
    bit-identical to the per-page path.
    """
    @partial(jax.jit, static_argnames=(
        "out_h", "out_w", "h_kernel", "v_kernel", "noise_kernel", "threshold",
        "pad_multiple"))
    def fused(variables, img_u8, out_h: int, out_w: int, h_kernel: int,
              v_kernel: int, noise_kernel: int, threshold: float,
              pad_multiple: int = 64):
        x = img_u8.astype(jnp.float32)                       # [B, H0, W0]
        if (out_h, out_w) != x.shape[1:]:
            x = jax.image.resize(x, (x.shape[0], out_h, out_w),
                                 method="linear", antialias=True)
        ph = -out_h % pad_multiple
        pw = -out_w % pad_multiple
        net_in = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))[..., None] / 255.0
        logits, _ = model.apply(variables, net_in)
        probs = jax.nn.softmax(logits, axis=-1)
        probs0 = probs[:, :out_h, :out_w, 0]
        # quantize-then-threshold replicates the reference's uint8 round trip
        net_u8 = (probs0.astype(jnp.float32) * 255.0).astype(jnp.uint8)
        binary = jnp.where(net_u8.astype(jnp.float32) > threshold * 255.0,
                           255.0, 0.0)
        cleaned = jax.vmap(
            lambda b: remove_small_components(b, jnp.int32(100)))(binary)
        horizontal, vertical = _separator_morphology_device(
            cleaned.astype(jnp.float32), h_kernel, v_kernel, noise_kernel)
        # stacked [2, B, H, W/32]: ONE readback per group instead of two
        # (each device->host transfer is a tunnel roundtrip)
        return jnp.stack([pack_bits_device(horizontal > 0),
                          pack_bits_device(vertical > 0)])

    return fused


def make_fused_separator_binary_fn(model):
    """Forward-only variant of :func:`make_fused_separator_fn`: resize ->
    ARU forward -> quantize -> threshold -> bit-pack, WITHOUT the device
    CC/morphology tail. Used when the native run-space post-processor
    (geometry.native.separator_post_native, bit-identical to the device
    chain) handles CC + openings on the host: the device CC fixpoint was
    ~180 ms per 7-page group — the single biggest slab of the wave
    pipeline's device floor — while the native post costs ~3-9 ms/page of
    otherwise idle host time, and the readback halves (one packed mask
    instead of stacked h/v)."""
    @partial(jax.jit, static_argnames=("out_h", "out_w", "threshold",
                                       "pad_multiple"))
    def fused(variables, img_u8, out_h: int, out_w: int, threshold: float,
              pad_multiple: int = 64):
        x = img_u8.astype(jnp.float32)
        if (out_h, out_w) != x.shape[1:]:
            x = jax.image.resize(x, (x.shape[0], out_h, out_w),
                                 method="linear", antialias=True)
        ph = -out_h % pad_multiple
        pw = -out_w % pad_multiple
        net_in = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))[..., None] / 255.0
        logits, _ = model.apply(variables, net_in)
        probs = jax.nn.softmax(logits, axis=-1)
        probs0 = probs[:, :out_h, :out_w, 0]
        net_u8 = (probs0.astype(jnp.float32) * 255.0).astype(jnp.uint8)
        binary = net_u8.astype(jnp.float32) > threshold * 255.0
        return pack_bits_device(binary)

    return fused


def pack_bits_device(mask: jnp.ndarray) -> jnp.ndarray:
    """[..., W] bool -> [..., ceil(W/8)] uint8, MSB-first (np.unpackbits
    compatible). jnp.packbits lowers to ~170 ms/batch gather code on TPU;
    this weighted-sum formulation is a plain VPU reduction (~2 ms)."""
    w = mask.shape[-1]
    pad = -w % 8
    if pad:
        mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    groups = mask.reshape(mask.shape[:-1] + ((w + pad) // 8, 8))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(groups.astype(jnp.int32) * weights, axis=-1).astype(jnp.uint8)


def unpack_mask_bits(packed: np.ndarray, width: int) -> np.ndarray:
    """[H, ceil(W/8)] uint8 bit rows -> [H, W] {0, 255} uint8 mask."""
    bits = np.unpackbits(np.asarray(packed), axis=-1, count=width)
    return (bits * 255).astype(np.uint8)


def _remove_small_components_host(binary: np.ndarray,
                                  min_size: int) -> np.ndarray:
    """scipy twin of ops.connected_components.remove_small_components for
    the CPU backend (the device labeling's associative scans lower poorly
    on the CPU; scipy's C label + bincount run in ~50 ms/page)."""
    import scipy.ndimage as ndi
    mask = np.asarray(binary) != 0
    labels, _ = ndi.label(mask, structure=np.ones((3, 3), np.int8))
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    keep = sizes[labels] >= min_size
    return np.where(keep, 255, 0).astype(np.float32)


def separator_post_process(binary: np.ndarray,
                           use_pallas: Optional[bool] = None,
                           use_native: Optional[bool] = None) -> Dict[str, np.ndarray]:
    """Post-process a thresholded separator-channel image into horizontal and
    vertical separator masks. Kernel sizes scale with image size exactly as
    the reference: h = 15*W/1000, v = 30*H/1500, noise = 10*W/1000.

    A fused pallas implementation of the morphology chain exists
    (ops/pallas/separator_morphology.py) and is bit-identical, but measured
    SLOWER than XLA's fused reduce_window chain on v5e (40 ms vs 2.2 ms for
    1500x1024 — the op is compute-bound and XLA's reduce_window codegen beats
    the roll+select doubling construction), so the XLA path is the default;
    pass use_pallas=True to opt in."""
    h, w = binary.shape
    h_kernel = max(1, int(15 * w / 1000))
    v_kernel = max(1, int(30 * h / 1500))
    noise_kernel = max(1, int(10 * w / 1000))

    if use_pallas is None:
        use_pallas = False

    if use_native is None:
        from citlab_as_tpu.config import runtime
        use_native = (not use_pallas
                      and runtime.get("sep_post") != "device")
    if use_native:
        from citlab_as_tpu.geometry.native import separator_post_native
        res = separator_post_native(binary, 100, h_kernel, v_kernel,
                                    noise_kernel)
        if res is not None:
            return {"horizontal": res[0], "vertical": res[1]}

    if use_pallas:
        from citlab_as_tpu.ops.pallas.separator_morphology import fused_separator_masks
        cleaned = remove_small_components(jnp.asarray(binary), jnp.int32(100))
        horizontal, vertical = fused_separator_masks(
            cleaned.astype(jnp.float32), h_kernel, v_kernel, noise_kernel)
        return {"horizontal": np.asarray(horizontal).astype(np.uint8),
                "vertical": np.asarray(vertical).astype(np.uint8)}

    # CC threshold: components < 100 px (1/size*100 of total, base:230-251)
    import jax
    if jax.default_backend() == "cpu":
        cleaned = _remove_small_components_host(binary, 100)
        horizontal, vertical = _separator_morphology_device(
            jnp.asarray(cleaned), h_kernel, v_kernel, noise_kernel)
    else:
        horizontal, vertical = _separator_masks_device(
            jnp.asarray(binary), jnp.int32(100), h_kernel, v_kernel, noise_kernel)
    return {"horizontal": np.asarray(horizontal), "vertical": np.asarray(vertical)}


def masks_to_polygons(mask: np.ndarray, separator_type: Optional[str] = None) -> Dict[str, list]:
    """Contours of a separator mask keyed by region name
    (separator_net_post_processor.py:99-115)."""
    contours = trace_contours(mask)
    key = SEPARATORREGION if separator_type is None else f"{SEPARATORREGION}_{separator_type}"
    return {key: contours}


def rescale_polygons_dict(polygons_dict: Dict[str, list], scaling_factor: float) -> Dict[str, list]:
    """Scale every ring of every polygon (base:253-268)."""
    out = {}
    for name, poly_list in polygons_dict.items():
        out[name] = [
            [[(x * scaling_factor, y * scaling_factor) for x, y in ring] for ring in rings]
            for rings in poly_list]
    return out


class SeparatorNetPostProcessor:
    """Run separator detection over images and write results to PAGE-XML.

    ``predict_fn(image_grey: np.ndarray[H, W]) -> np.ndarray[H, W, C]`` is the
    net forward (ARU-Net probabilities, channel 0 = separator). This decouples
    the stage from model loading so tests can inject synthetic nets.
    """

    def __init__(self, image_list, predict_fn: Callable[[np.ndarray], np.ndarray],
                 fixed_height: Optional[int] = 1500, scaling_factor: float = 1.0,
                 threshold: float = 0.05):
        if isinstance(image_list, str):
            from citlab_as_tpu.utils.io import load_list_file
            self.image_paths = load_list_file(image_list)
        else:
            self.image_paths = list(image_list)
        self.predict_fn = predict_fn
        self.fixed_height = fixed_height
        self.scaling_factor = scaling_factor
        self.threshold = threshold
        # per-page fault hook (utils/faults.py): None = raise through
        # (historical behavior); a callback(image_path, stage, exc) switches
        # every per-page loop to the reference's log-and-skip contract
        self.on_page_error = None

    def process_image(self, image_grey: np.ndarray, sc: float):
        """Device inference + post-processing for one scaled grayscale image.
        Returns the rescaled polygons dict."""
        net_output = np.asarray(self.predict_fn(image_grey))
        net_output = np.asarray(net_output * 255, dtype=np.uint8)
        binary = apply_threshold(net_output[..., 0], self.threshold)
        masks = separator_post_process(binary)
        polygons_dict = {}
        for separator_type, mask in masks.items():
            polygons_dict.update(masks_to_polygons(mask, separator_type))
        return rescale_polygons_dict(polygons_dict, 1.0 / sc)

    def _write_page(self, image_path: str, polygons_dict) -> object:
        page_path = get_page_path(image_path)
        writer = SeparatorRegionToPageWriter(
            page_path, image_path, self.fixed_height, self.scaling_factor,
            polygons_dict)
        writer.remove_separator_regions_from_page()
        writer.merge_regions()
        logger.debug("Saving separator results to %s.xml", page_path)
        writer.save_page_xml(page_path + ".xml")
        return writer.page_object

    def run(self) -> List:
        from citlab_as_tpu.utils.faults import page_guard
        pages = []
        for image_path in self.image_paths:
            def run_one(image_path=image_path):
                image = load_image(image_path, mode="L").astype(np.float32)
                scaled, sc = scale_image(image, self.fixed_height,
                                         self.scaling_factor)
                image_grey = np.asarray(scaled) / 255.0
                polygons_dict = self.process_image(image_grey, sc)
                pages.append(self._write_page(image_path, polygons_dict))
            page_guard(self.on_page_error, image_path, "separator", run_one)
        return pages

    def run_batched(self, batch_size: int = 4) -> List:
        """Throughput variant: net forwards batched through the predictor's
        ``predict_batch`` (same-bucket padding on device), post-processing and
        writing per page. Requires a predictor exposing ``predict_batch``
        (e.g. inference.SegmentationPredictor); falls back to :meth:`run`.

        Dispatch-ahead pipelining: jit dispatch is asynchronous, so the next
        chunk's forward is enqueued on the device BEFORE the previous chunk's
        results are materialized to the host — contour tracing and PAGE-XML
        writing overlap the device compute."""
        if not hasattr(self.predict_fn, "predict_batch"):
            return self.run()
        # accelerator backends route to the fused whole-stage device pipeline
        # (identical results); on CPU the device CC labeling is slower than
        # the scipy path, so the classic per-stage path stays the default
        if (hasattr(self.predict_fn, "model")
                and hasattr(self.predict_fn, "variables")
                and jax.default_backend() != "cpu"):
            return self.run_batched_fused(batch_size=batch_size)
        pages = []
        in_flight = None   # (chunk_paths, outputs, scales) awaiting host work

        from citlab_as_tpu.utils.faults import page_guard

        def drain(entry):
            chunk, outputs, scales = entry
            if callable(outputs):     # device handle -> materialize now
                outputs = outputs()
            for image_path, net_output, sc in zip(chunk, outputs, scales):
                def drain_one(image_path=image_path, net_output=net_output,
                              sc=sc):
                    net_u8 = np.asarray(net_output * 255, dtype=np.uint8)
                    binary = apply_threshold(net_u8[..., 0], self.threshold)
                    masks = separator_post_process(binary)
                    polygons_dict = {}
                    for separator_type, mask in masks.items():
                        polygons_dict.update(masks_to_polygons(mask, separator_type))
                    polygons_dict = rescale_polygons_dict(polygons_dict, 1.0 / sc)
                    pages.append(self._write_page(image_path, polygons_dict))
                page_guard(self.on_page_error, image_path, "separator",
                           drain_one)

        for start in range(0, len(self.image_paths), batch_size):
            raw_chunk = self.image_paths[start:start + batch_size]
            chunk, greys, scales = [], [], []
            for image_path in raw_chunk:
                def load_one(image_path=image_path):
                    image = load_image(image_path, mode="L").astype(np.float32)
                    scaled, sc = scale_image(image, self.fixed_height,
                                             self.scaling_factor)
                    chunk.append(image_path)
                    greys.append(np.asarray(scaled) / 255.0)
                    scales.append(sc)
                page_guard(self.on_page_error, image_path, "load", load_one)
            if not chunk:
                continue
            if hasattr(self.predict_fn, "predict_batch_device"):
                outputs = self.predict_fn.predict_batch_device(greys)
            else:
                outputs = self.predict_fn.predict_batch(greys)
            if in_flight is not None:
                drain(in_flight)
            in_flight = (chunk, outputs, scales)
        if in_flight is not None:
            drain(in_flight)
        return pages

    def fused_dispatch(self, images: List[np.ndarray], chunk: List[str],
                       max_batch: int, device_batch=None):
        """Enqueue the fused device pipeline for one SAME-SHAPE page group
        (async; returns the in-flight entry for :meth:`fused_drain`).
        Remainder groups pad to ``max_batch`` by repeating the last page so
        a corpus compiles one program per page shape. ``device_batch`` lets
        a pipeline driver share ONE uploaded [max_batch, H0, W0] uint8 array
        between stages instead of uploading the images per stage."""
        import os

        from citlab_as_tpu.ops.resize import get_scaling_factor

        h0, w0 = images[0].shape
        sc = get_scaling_factor(h0, w0, self.scaling_factor,
                                fixed_height=self.fixed_height)
        out_h, out_w = (h0, w0) if sc == 1.0 else (int(h0 * sc), int(w0 * sc))
        h_kernel = max(1, int(15 * out_w / 1000))
        v_kernel = max(1, int(30 * out_h / 1500))
        noise_kernel = max(1, int(10 * out_w / 1000))
        if device_batch is not None:
            batch = device_batch
        else:
            while len(images) < max_batch:
                images = images + [images[-1]]
            batch = jnp.asarray(np.stack(images))

        # native host post (bit-identical, golden-tested) keeps the device
        # program forward-only — the device CC fixpoint was the biggest
        # slab of the wave pipeline's device floor. CITLAB_SEP_POST=device
        # restores the fully fused device chain.
        from citlab_as_tpu.config import runtime
        from citlab_as_tpu.geometry.native import native_available
        use_native = (runtime.get("sep_post") != "device"
                      and native_available())
        from citlab_as_tpu.ops.device_hold import hold
        if use_native:
            fused = getattr(self.predict_fn, "_fused_separator_binary", None)
            if fused is None:
                fused = make_fused_separator_binary_fn(self.predict_fn.model)
                self.predict_fn._fused_separator_binary = fused
            bin_packed = fused(
                self.predict_fn.variables, batch, out_h=out_h, out_w=out_w,
                threshold=self.threshold,
                pad_multiple=getattr(self.predict_fn, "pad_multiple", 64))
            hold(batch, bin_packed)
            return {"chunk": chunk, "packed": bin_packed,
                    "out_h": out_h, "out_w": out_w,
                    "scales": [sc] * len(chunk),
                    "kernels": (h_kernel, v_kernel, noise_kernel),
                    "materialized": False}

        fused = getattr(self.predict_fn, "_fused_separator", None)
        if fused is None:
            fused = make_fused_separator_fn(self.predict_fn.model)
            self.predict_fn._fused_separator = fused
        hv_packed = fused(
            self.predict_fn.variables, batch, out_h=out_h, out_w=out_w,
            h_kernel=h_kernel, v_kernel=v_kernel, noise_kernel=noise_kernel,
            threshold=self.threshold,
            pad_multiple=getattr(self.predict_fn, "pad_multiple", 64))
        hold(batch, hv_packed)
        return (chunk, hv_packed, out_w, [sc] * len(chunk))

    def fused_prefetch(self, entry) -> None:
        """Start the async device->host copy of the group's packed masks —
        a pipeline driver calls this right after dispatching the NEXT
        group's big programs, so the transfer rides the wire during the
        wave's host tail instead of blocking at the materialize barrier
        (~1.3 MB/group at ~80-100 MB/s plus the 32 ms roundtrip floor)."""
        from citlab_as_tpu.utils.async_copy import prefetch
        if isinstance(entry, dict):
            if not entry["materialized"]:
                prefetch(entry["packed"])
        else:
            prefetch(entry[1])

    def fused_materialize(self, entry):
        """Device barrier only: download the group's bit-packed masks in
        ONE readback (the program returns them stacked). A pipeline driver
        calls this BEFORE dispatching the next group's big programs so the
        whole host tail then overlaps device compute."""
        if isinstance(entry, dict):                 # native-post mode
            if not entry["materialized"]:
                entry = dict(entry, packed=np.asarray(entry["packed"]),
                             materialized=True)
            return entry
        chunk, hv_packed, out_w, scales = entry
        hv = np.asarray(hv_packed)
        return (chunk, hv[0], hv[1], out_w, scales)

    def fused_drain(self, entry, pages_by_path: dict, phase=None) -> None:
        """Materialize one in-flight group (no-op if already materialized)
        and do the host tail (unpack, contour trace, rescale, write
        PAGE-XML)."""
        import time as _time
        t0 = _time.perf_counter()
        if isinstance(entry, dict) or len(entry) == 4:  # raw in-flight entry
            entry = self.fused_materialize(entry)
        if isinstance(entry, dict):                     # native-post mode
            if phase is not None:
                phase["materialize"] += _time.perf_counter() - t0
            self._drain_native(entry, pages_by_path, phase)
            return
        chunk, h_packed, v_packed, out_w, scales = entry
        h_packed = np.asarray(h_packed)
        v_packed = np.asarray(v_packed)
        if phase is not None:
            phase["materialize"] += _time.perf_counter() - t0
        from citlab_as_tpu.utils.faults import page_guard
        for i, (image_path, sc) in enumerate(zip(chunk, scales)):
            t0 = _time.perf_counter()

            def drain_one(i=i, image_path=image_path, sc=sc):
                nonlocal t0
                masks = {
                    "horizontal": unpack_mask_bits(h_packed[i], out_w),
                    "vertical": unpack_mask_bits(v_packed[i], out_w),
                }
                polygons_dict = {}
                for separator_type, mask in masks.items():
                    polygons_dict.update(masks_to_polygons(mask, separator_type))
                polygons_dict = rescale_polygons_dict(polygons_dict, 1.0 / sc)
                if phase is not None:
                    phase["contours"] += _time.perf_counter() - t0
                t0 = _time.perf_counter()
                pages_by_path[image_path] = self._write_page(
                    image_path, polygons_dict)
                if phase is not None:
                    phase["write"] += _time.perf_counter() - t0
            page_guard(self.on_page_error, image_path, "separator", drain_one)

    def _drain_native(self, entry: dict, pages_by_path: dict, phase=None) -> None:
        """Host tail of the native-post mode: run the C run-space post-chain
        (CC filter + openings, bit-identical to the device chain) straight
        off the bit-packed readback — the dense binary is never
        materialized — then contours + PAGE-XML as usual."""
        import time as _time

        from citlab_as_tpu.geometry.native import separator_post_native_packed

        h_kernel, v_kernel, noise_kernel = entry["kernels"]
        packed, out_w = entry["packed"], entry["out_w"]
        from citlab_as_tpu.utils.faults import page_guard
        for i, (image_path, sc) in enumerate(zip(entry["chunk"],
                                                 entry["scales"])):
            t0 = _time.perf_counter()

            def drain_one(i=i, image_path=image_path, sc=sc):
                nonlocal t0
                horizontal, vertical = separator_post_native_packed(
                    packed[i], out_w, 100, h_kernel, v_kernel, noise_kernel)
                masks = {"horizontal": horizontal, "vertical": vertical}
                polygons_dict = {}
                for separator_type, mask in masks.items():
                    polygons_dict.update(masks_to_polygons(mask, separator_type))
                polygons_dict = rescale_polygons_dict(polygons_dict, 1.0 / sc)
                if phase is not None:
                    phase["contours"] += _time.perf_counter() - t0
                t0 = _time.perf_counter()
                pages_by_path[image_path] = self._write_page(
                    image_path, polygons_dict)
                if phase is not None:
                    phase["write"] += _time.perf_counter() - t0
            page_guard(self.on_page_error, image_path, "separator", drain_one)

    @staticmethod
    def group_by_shape(image_paths: List[str], max_batch: int,
                       on_error=None):
        """Lazily load images and yield consecutive same-shape page groups
        (static jit shapes per group) as (images, chunk_paths). Generator so
        a large corpus holds at most one group of images in memory.
        ``on_error(image_path, stage, exc)`` switches load failures
        (truncated/unreadable image) to the log-and-skip contract."""
        images: List[np.ndarray] = []
        chunk: List[str] = []
        for image_path in image_paths:
            try:
                image = np.asarray(load_image(image_path, mode="L"), np.uint8)
            except Exception as e:  # noqa: BLE001 - the skip contract
                if on_error is None:
                    raise
                on_error(image_path, "load", e)
                continue
            if images and (images[0].shape != image.shape
                           or len(images) >= max_batch):
                yield images, chunk
                images, chunk = [], []
            images.append(image)
            chunk.append(image_path)
        if images:
            yield images, chunk

    def run_batched_fused(self, batch_size: int = 4) -> List:
        """Fully fused device path (see :func:`make_fused_separator_fn`):
        uint8 originals up, bit-packed h/v masks down, one jit dispatch per
        same-shape page group, two-deep dispatch-ahead pipelining so contour
        tracing and PAGE-XML writing overlap device compute."""
        import time as _time
        pages_by_path: dict = {}
        in_flight = None
        phase = {"load": 0.0, "dispatch": 0.0, "materialize": 0.0,
                 "contours": 0.0, "write": 0.0}
        max_batch = min(batch_size,
                        getattr(self.predict_fn, "MAX_DEVICE_BATCH", batch_size))
        t0 = _time.perf_counter()
        groups = self.group_by_shape(self.image_paths, max_batch,
                                     on_error=self.on_page_error)
        phase["load"] += _time.perf_counter() - t0

        for images, chunk in groups:
            t_disp = _time.perf_counter()
            entry = self.fused_dispatch(images, chunk, max_batch)
            phase["dispatch"] += _time.perf_counter() - t_disp
            if in_flight is not None:
                self.fused_drain(in_flight, pages_by_path, phase)
            in_flight = entry
        if in_flight is not None:
            self.fused_drain(in_flight, pages_by_path, phase)
        # stage end: every drain materialized, queue quiet -> safe point to
        # drop the pinned group buffers (see ops/device_hold.py)
        from citlab_as_tpu.ops.device_hold import release
        release()
        logger.info("separator fused phases (s): %s",
                    {k: round(v, 3) for k, v in phase.items()})
        return [pages_by_path[p] for p in self.image_paths]
