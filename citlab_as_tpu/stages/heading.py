"""Heading detection stage (pipeline stage 3).

Reference: heading_net_post_processor.py:19-310. Fuses ARU-Net heading
probabilities with stroke-width / text-height features from the distance
transform:

1. per text line: mean net probability over its (rescaled) bbox; stroke
   width (median per-CC max DT) and text height (max CC height) from the
   full-resolution SWT image;
2. page-level normalization: subtract the per-page mode, rescale to [0, 1];
3. decision: heading if any hard threshold fires (net >= 1.0 /
   stroke-width >= 1.0 / text-height >= 0.9 / (sw+th)/2 >= 0.9 by default)
   or the weighted sum (net .8, sw 0, th .2) exceeds the threshold (0.4);
4. a TextRegion becomes type 'heading' when >= text_line_percentage (0.8)
   of its lines are headings; all other regions are reset to 'paragraph'.
"""
from __future__ import annotations

from collections import Counter
from typing import Callable, Dict, List, Optional

import numpy as np

from citlab_as_tpu.ops.resize import scale_image
from citlab_as_tpu.ops.swt import StrokeWidthDistanceTransform
from citlab_as_tpu.pagexml.constants import TextRegionTypes
from citlab_as_tpu.stages.separator_writer import RegionToPageWriter
from citlab_as_tpu.utils.io import get_page_path, load_image
from citlab_as_tpu.utils.logging import setup_custom_logger

logger = setup_custom_logger(__name__)

DEFAULT_WEIGHTS = {"net": 0.8, "stroke_width": 0.0, "text_height": 0.2}
DEFAULT_THRESHOLDS = {"net_thresh": 1.0, "stroke_width_thresh": 1.0,
                      "text_height_thresh": 0.9, "sw_th_thresh": 0.9}


def make_fused_heading_fn(model):
    """Device pipeline: original uint8 pages -> quantized uint8 heading
    probability map (channel 0), fused resize + ARU forward + quantize in one
    jit. The uint8 map is what the host classifier consumes (it divides by
    255 again, heading:247-270), so reading back 1 byte/px instead of the
    f32 multi-channel probabilities is lossless AND 8x smaller."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("out_h", "out_w", "pad_multiple"))
    def fused(variables, img_u8, out_h: int, out_w: int,
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
        return (probs0.astype(jnp.float32) * 255.0).astype(jnp.uint8)

    return fused


def make_fused_heading_swt_fn(model):
    """Round-3 variant: ONE jit computing BOTH the heading probability map
    and the full-resolution SWT distance transform (invert -> Gaussian+Otsu
    -> capped EDT, swt_dist_trafo.py:18-29) from the same uploaded uint8
    batch. Neither output is read back: both stay device-resident and feed
    the per-line feature programs (ops/swt_device.py), which drain only
    [n_lines, 3] scalars per page — the DT image never crosses the host
    link, and the heading stage's host work shrinks to XML handling."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from citlab_as_tpu.ops.binarize import otsu_binarize
    from citlab_as_tpu.ops.distance_transform import distance_transform_edt

    @partial(jax.jit, static_argnames=("out_h", "out_w", "pad_multiple"))
    def fused(variables, img_u8, out_h: int, out_w: int,
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
        prob_u8 = (probs0.astype(jnp.float32) * 255.0).astype(jnp.uint8)

        def dt_one(img):
            inv = 255.0 - img.astype(jnp.float32)
            _, binary = otsu_binarize(inv, blur_ksize=5)
            return distance_transform_edt(binary, cap=255.0).astype(jnp.uint8)

        dt_u8 = jax.vmap(dt_one)(img_u8)
        return prob_u8, dt_u8

    return fused


def scale_to_new_interval(data, old_min, old_max, new_min=0.0, new_max=1.0):
    """Affine remap of ``data`` from [old_min, old_max] to [new_min, new_max]
    (heading:51-64); identity when the old interval is degenerate."""
    if old_max - old_min == 0:
        return data
    return (new_max - new_min) / (old_max - old_min) * (data - old_min) + new_min


class HeadingNetPostProcessor:
    """``predict_fn(image_grey[H, W]) -> probabilities[H, W, C]`` decouples
    the stage from model loading (channel 0 = heading)."""

    def __init__(self, image_list, predict_fn: Optional[Callable] = None,
                 fixed_height: Optional[int] = 900, scaling_factor: float = 1.0,
                 weight_dict: Optional[Dict[str, float]] = None,
                 threshold: float = 0.4,
                 thresh_dict: Optional[Dict[str, float]] = None,
                 text_line_percentage: float = 0.8,
                 page_paths: Optional[List[str]] = None,
                 save_suffix: str = ".xml"):
        """``page_paths``/``save_suffix`` let a pipeline driver chain this
        stage onto another stage's output pages (e.g. the separator stage's
        ``<page>.xml.xml``, updated in place with ``save_suffix=''``);
        defaults preserve the standalone CLI contract
        (``page/<name>.xml`` in, ``page/<name>.xml.xml`` out)."""
        if isinstance(image_list, str):
            from citlab_as_tpu.utils.io import load_list_file
            self.image_paths = load_list_file(image_list)
        else:
            self.image_paths = list(image_list)
        if page_paths is not None and len(page_paths) != len(self.image_paths):
            raise ValueError("page_paths must match image_list length")
        self.page_paths = list(page_paths) if page_paths is not None else None
        self.save_suffix = save_suffix
        self.predict_fn = predict_fn
        self.fixed_height = fixed_height
        self.scaling_factor = scaling_factor
        self.swt = StrokeWidthDistanceTransform(dark_on_bright=True)
        self.weight_dict = dict(weight_dict) if weight_dict else dict(DEFAULT_WEIGHTS)
        self.threshold = threshold
        self.thresh_dict = dict(thresh_dict) if thresh_dict else dict(DEFAULT_THRESHOLDS)
        self.text_line_percentage = text_line_percentage
        # device SWT path (fused DT + per-line feature programs); None =
        # auto (on for accelerator backends, off on CPU where scipy wins)
        self.use_device_swt: Optional[bool] = None
        self._device_features = None
        # per-page fault hook (utils/faults.py): None = raise through;
        # a callback(image_path, stage, exc) switches the per-page loops
        # to the log-and-skip contract
        self.on_page_error = None
        # device path: saved per-line (bbox, stroke_width, text_height) per
        # page — the GNN feature stage needs the SAME quantities for the
        # same lines (feature_generation.py:105-159) and can reuse them
        # instead of recomputing a host distance transform
        self.line_features_by_page: Dict[str, Dict] = {}

    def _page_path_for(self, image_path: str) -> str:
        if self.page_paths is not None:
            return dict(zip(self.image_paths, self.page_paths))[image_path]
        return get_page_path(image_path)

    # ------------------------------------------------------------------
    def get_net_prob_for_text_line(self, net_output, text_line, scaling_factor) -> float:
        """Mean net probability over the rescaled line bbox (heading:247-270)."""
        if text_line.surr_p is None:
            return 0.0
        poly = text_line.surr_p.to_polygon()
        if scaling_factor is not None:
            poly.rescale(scaling_factor)
        bb = poly.get_bounding_box()
        if bb.width <= 0 or bb.height <= 0:
            return 0.0
        crop = net_output[bb.y:bb.y + bb.height, bb.x:bb.x + bb.width]
        return float(np.sum(crop) / (bb.width * bb.height))

    # ------------------------------------------------------------------
    def line_feature_boxes(self, text_lines, scaling_factor):
        """[L, 4] int32 (x, y, w, h) bbox pairs for the device feature
        programs: unscaled (SWT crop) and rescaled (net prob crop) — the
        same bboxes the host path computes. Lines without a surrounding
        polygon are marked w = -1 (features forced to zero)."""
        swt_boxes = np.full((len(text_lines), 4), -1, np.int32)
        net_boxes = np.full((len(text_lines), 4), -1, np.int32)
        for i, tl in enumerate(text_lines):
            if tl.surr_p is None:
                continue
            poly = tl.surr_p.to_polygon()
            bb = poly.get_bounding_box()
            swt_boxes[i] = (bb.x, bb.y, bb.width, bb.height)
            if scaling_factor is not None:
                poly.rescale(scaling_factor)
                bb = poly.get_bounding_box()
            net_boxes[i] = (bb.x, bb.y, bb.width, bb.height)
        return swt_boxes, net_boxes

    def classify_page(self, page_object, scaling_factor,
                      net_output_post: Optional[np.ndarray],
                      swt_feature_image: Optional[np.ndarray],
                      save_features_key: Optional[str] = None) -> None:
        """Tag TextLines (custom structure{semantic_type:heading}) and
        TextRegions (type=heading) in place (heading:66-200).

        ``save_features_key``: page path under which to stash the per-line
        (bbox, stroke_width, text_height) in ``line_features_by_page`` so
        the GNN feature stage can reuse them instead of recomputing a host
        distance transform (the device path saves them in fused_finish)."""
        text_lines = page_object.textlines   # snapshot

        sw_raw, th_raw, net_prob = {}, {}, {}
        saved = {}
        for tl in text_lines:
            if tl.surr_p is None or swt_feature_image is None:
                sw_raw[tl.id], th_raw[tl.id] = 0.0, 0
            else:
                bb = tl.surr_p.to_polygon().get_bounding_box()
                sw_raw[tl.id], th_raw[tl.id] = self.swt.textline_features(
                    swt_feature_image, (bb.x, bb.y, bb.width, bb.height))
                saved[tl.id] = ((bb.x, bb.y, bb.width, bb.height),
                                sw_raw[tl.id], th_raw[tl.id])
            if self.weight_dict["net"] == 0 or net_output_post is None:
                net_prob[tl.id] = 0.0
            else:
                net_prob[tl.id] = self.get_net_prob_for_text_line(
                    net_output_post, tl, scaling_factor)
        if save_features_key is not None and swt_feature_image is not None:
            self.line_features_by_page[save_features_key] = saved
        self.classify_from_features(page_object, text_lines,
                                    net_prob, sw_raw, th_raw)

    def classify_from_features(self, page_object, text_lines,
                               net_prob: Dict, sw_raw: Dict,
                               th_raw: Dict) -> None:
        """Decision half of the stage (page-mode normalization, hard
        thresholds, weighted sum, >=80% region typing) — shared verbatim by
        the host and device feature paths so fused-vs-run parity holds by
        construction on this side."""
        use_swt = len(sw_raw) > 0
        if use_swt:
            sw_mode = Counter(sw_raw.values()).most_common(1)[0][0]
            th_mode = Counter(th_raw.values()).most_common(1)[0][0]
            sw_diff = {k: v - sw_mode for k, v in sw_raw.items()}
            th_diff = {k: v - th_mode for k, v in th_raw.items()}
            sw_min, sw_max = min(sw_diff.values()), max(sw_diff.values())
            th_min, th_max = min(th_diff.values()), max(th_diff.values())

        w = self.weight_dict
        t = self.thresh_dict
        for tl in text_lines:
            net_conf = net_prob[tl.id]
            if use_swt:
                sw_conf = scale_to_new_interval(sw_diff[tl.id], sw_min, sw_max)
                th_conf = scale_to_new_interval(th_diff[tl.id], th_min, th_max)
                if (sw_conf >= t["stroke_width_thresh"]
                        or th_conf >= t["text_height_thresh"]
                        or (sw_conf + th_conf) / 2 >= t["sw_th_thresh"]
                        or net_conf >= t["net_thresh"]):
                    conf = 1.0
                else:
                    conf = (w["net"] * net_conf + w["stroke_width"] * sw_conf
                            + w["text_height"] * th_conf)
            else:
                conf = net_conf

            if conf > self.threshold:
                nd = page_object.get_child_by_id(page_object.page_doc, tl.id)[0]
                # mirror the write into the snapshot object so the textlines
                # snapshot stays coherent with the DOM (re-validated below —
                # saves downstream stages a full re-derivation)
                tl.custom.setdefault("structure", {})[
                    "semantic_type"] = str(TextRegionTypes.HEADING)
                page_object.set_custom_attr_from_dict(nd, tl.custom)

        for text_region in page_object.get_text_regions():
            nd = page_object.get_child_by_id(page_object.page_doc, text_region.id)[0]
            nd.set("type", TextRegionTypes.PARAGRAPH)
            if not text_region.text_lines:
                continue
            n_headings = sum(
                1 for tl in text_region.text_lines
                if tl.custom.get("structure", {}).get("semantic_type") == TextRegionTypes.HEADING)
            if n_headings / len(text_region.text_lines) >= self.text_line_percentage:
                nd.set("type", TextRegionTypes.HEADING)
        # region @type edits above bypass the Page API: invalidate snapshots.
        # The per-line semantic_type writes were mirrored into the snapshot
        # objects themselves (text_lines IS the snapshot at both call sites),
        # so re-validate it — region @type lives outside the snapshot. The
        # identity check keeps an external caller passing a SUBSET list from
        # clobbering the snapshot with it.
        page_object.mark_dom_mutated()
        if getattr(page_object, "_textlines_snap", None) is text_lines:
            page_object.textlines = text_lines

    # ------------------------------------------------------------------
    def run(self) -> List:
        from citlab_as_tpu.utils.faults import page_guard
        pages = []
        for image_path in self.image_paths:
            def run_one(image_path=image_path):
                image = load_image(image_path, mode="L").astype(np.float32)

                net_output_post = None
                if self.weight_dict["net"] > 0 and self.predict_fn is not None:
                    scaled, _sc = scale_image(image, self.fixed_height,
                                              self.scaling_factor)
                    image_grey = np.asarray(scaled) / 255.0
                    net_output = np.asarray(self.predict_fn(image_grey))
                    # match the reference's quantize-then-normalize round trip
                    net_output = np.asarray(net_output * 255, dtype=np.uint8)
                    net_output_post = net_output[:, :, 0] / 255.0

                swt_feature_image = self.swt.distance_transform(
                    image, cache_key=image_path)

                page_path = self._page_path_for(image_path)
                writer = RegionToPageWriter(
                    page_path, path_to_image=image_path,
                    fixed_height=self.fixed_height, scaling_factor=self.scaling_factor)
                self.classify_page(writer.page_object, writer.scaling_factor,
                                   net_output_post, swt_feature_image,
                                   save_features_key=page_path + self.save_suffix)
                logger.debug("Saving heading results to %s%s", page_path,
                             self.save_suffix)
                writer.save_page_xml(page_path + self.save_suffix)
                pages.append(writer.page_object)
            page_guard(self.on_page_error, image_path, "heading", run_one)
        return pages

    def run_batched(self, batch_size: int = 4) -> List:
        """Batched + dispatch-ahead variant of :meth:`run` (cf.
        SeparatorNetPostProcessor.run_batched): the next chunk's net forward
        is enqueued before the previous chunk's SWT/classification host work
        runs. Falls back to :meth:`run` without a batching predictor."""
        if (self.predict_fn is None or self.weight_dict["net"] == 0
                or not hasattr(self.predict_fn, "predict_batch")):
            return self.run()
        import jax
        if (hasattr(self.predict_fn, "model")
                and hasattr(self.predict_fn, "variables")
                and (jax.default_backend() != "cpu"
                     or self.use_device_swt is True)):
            # explicit use_device_swt=True forces the fused path even on
            # CPU (tests exercising the production device-SWT shape)
            return self.run_batched_fused(batch_size=batch_size)
        pages = []
        in_flight = None

        from citlab_as_tpu.utils.faults import page_guard

        def drain(entry):
            chunk, outputs, images = entry
            if callable(outputs):
                outputs = outputs()
            for image_path, net_output, image in zip(chunk, outputs, images):
                def drain_one(image_path=image_path, net_output=net_output,
                              image=image):
                    net_u8 = np.asarray(net_output * 255, dtype=np.uint8)
                    net_output_post = net_u8[:, :, 0] / 255.0
                    swt_feature_image = self.swt.distance_transform(image, cache_key=image_path)
                    page_path = self._page_path_for(image_path)
                    writer = RegionToPageWriter(
                        page_path, path_to_image=image_path,
                        fixed_height=self.fixed_height,
                        scaling_factor=self.scaling_factor)
                    self.classify_page(writer.page_object, writer.scaling_factor,
                                       net_output_post, swt_feature_image,
                                       save_features_key=page_path + self.save_suffix)
                    writer.save_page_xml(page_path + self.save_suffix)
                    pages.append(writer.page_object)
                page_guard(self.on_page_error, image_path, "heading",
                           drain_one)

        for start in range(0, len(self.image_paths), batch_size):
            raw_chunk = self.image_paths[start:start + batch_size]
            chunk, greys, images = [], [], []
            for image_path in raw_chunk:
                def load_one(image_path=image_path):
                    image = load_image(image_path, mode="L").astype(np.float32)
                    scaled, _ = scale_image(image, self.fixed_height,
                                            self.scaling_factor)
                    chunk.append(image_path)
                    greys.append(np.asarray(scaled) / 255.0)
                    images.append(image)
                page_guard(self.on_page_error, image_path, "load", load_one)
            if not chunk:
                continue
            if hasattr(self.predict_fn, "predict_batch_device"):
                outputs = self.predict_fn.predict_batch_device(greys)
            else:
                outputs = self.predict_fn.predict_batch(greys)
            if in_flight is not None:
                drain(in_flight)
            in_flight = (chunk, outputs, images)
        if in_flight is not None:
            drain(in_flight)
        return pages

    def fused_dispatch(self, images: List[np.ndarray], chunk: List[str],
                       max_batch: int, device_batch=None):
        """Enqueue the fused heading forward for one same-shape page group
        (async); returns the in-flight entry for :meth:`fused_drain`.
        ``device_batch`` shares an already-uploaded uint8 batch (see
        SeparatorNetPostProcessor.fused_dispatch).

        On accelerator backends the program also computes the full-res SWT
        distance transform on device (make_fused_heading_swt_fn); both
        outputs stay device-resident for the per-line feature programs."""
        import jax
        import jax.numpy as jnp
        from citlab_as_tpu.ops.resize import get_scaling_factor

        if self.use_device_swt is None:
            self.use_device_swt = jax.default_backend() != "cpu"
        if self.use_device_swt:
            fused = getattr(self.predict_fn, "_fused_heading_swt", None)
            if fused is None:
                fused = make_fused_heading_swt_fn(self.predict_fn.model)
                self.predict_fn._fused_heading_swt = fused
        else:
            fused = getattr(self.predict_fn, "_fused_heading", None)
            if fused is None:
                fused = make_fused_heading_fn(self.predict_fn.model)
                self.predict_fn._fused_heading = fused
        h0, w0 = images[0].shape
        sc = get_scaling_factor(h0, w0, self.scaling_factor,
                                fixed_height=self.fixed_height)
        out_h, out_w = (h0, w0) if sc == 1.0 else (int(h0 * sc), int(w0 * sc))
        orig = list(images)
        if device_batch is not None:
            batch = device_batch
        else:
            while len(images) < max_batch:
                images = images + [images[-1]]
            batch = jnp.asarray(np.stack(images))
        out = fused(
            self.predict_fn.variables, batch,
            out_h=out_h, out_w=out_w,
            pad_multiple=getattr(self.predict_fn, "pad_multiple", 64))
        if self.use_device_swt:
            maps_u8, dt_u8 = out
        else:
            maps_u8, dt_u8 = out, None
        from citlab_as_tpu.ops.device_hold import hold
        hold(batch, maps_u8, dt_u8)
        if dt_u8 is not None and self._native_line_stats():
            # native per-line stats mode: the host kernel needs the DT image
            # — enqueue its device->host copy right behind the fused program
            # so the ~1.5 MB/page ride the wire during this group's own wave
            # instead of stalling the heading drain two waves later
            from citlab_as_tpu.utils.async_copy import prefetch
            prefetch(dt_u8)
        return (chunk, maps_u8, dt_u8, orig)

    @staticmethod
    def _native_line_stats() -> bool:
        from citlab_as_tpu.config import runtime
        if runtime.get("swt_extract") != "native":
            return False
        from citlab_as_tpu.geometry.native import native_available
        return native_available()

    def fused_drain_dispatch(self, entry):
        """First half of the drain: on the device-SWT path, per page the
        line bboxes go UP and the tiny per-line feature programs are
        enqueued (nothing materialized yet) — a pipeline driver calls this
        BEFORE dispatching the next group's big programs so the small ones
        are not stuck behind them. Returns the state for
        :meth:`fused_drain_finish`."""
        chunk, maps_u8, dt_u8, images = entry
        if not self.use_device_swt or dt_u8 is None:
            return ("host", entry)

        from citlab_as_tpu.ops.swt_device import DeviceLineFeatures
        if self._device_features is None:
            self._device_features = DeviceLineFeatures()

        from citlab_as_tpu.utils.faults import page_guard
        pages, swt_list, net_list = [], [], []
        for i, image_path in enumerate(chunk):
            def prepare_one(i=i, image_path=image_path):
                page_path = self._page_path_for(image_path)
                writer = RegionToPageWriter(
                    page_path, path_to_image=image_path,
                    fixed_height=self.fixed_height,
                    scaling_factor=self.scaling_factor)
                text_lines = writer.page_object.textlines   # snapshot
                swt_boxes, net_boxes = self.line_feature_boxes(
                    text_lines, writer.scaling_factor)
                return ((image_path, page_path, writer, text_lines),
                        swt_boxes, net_boxes)
            prepared = page_guard(self.on_page_error, image_path, "heading",
                                  prepare_one)
            if prepared is None:
                # skipped page: keep its slot so the box lists stay aligned
                # with the device batch index i (dt_u8[i]/maps_u8[i]); the
                # None page entry drops out in fused_finish
                prepared = (None, [], [])
            pages.append(prepared[0])
            swt_list.append(prepared[1])
            net_list.append(prepared[2])
        if not any(p is not None for p in pages):
            return ("device", (pages, lambda: [([], None)] * len(pages)))
        # ONE device dispatch for the whole group's line features
        handle = self._device_features.dispatch_batch(
            dt_u8, maps_u8, swt_list, net_list)
        return ("device", (pages, handle))

    def fused_materialize(self, state):
        """Read back one group's per-line feature scalars (device path) or
        probability maps (host path). On the axon tunnel this MUST run
        before any further device dispatch/upload: a readback racing
        later-enqueued programs or an in-flight upload poisons the client
        (ROUND3_NOTES.md). Returns the input for :meth:`fused_finish`."""
        kind, payload = state
        if kind == "host":
            chunk, maps_u8, _dt, images = payload
            return ("host", (chunk, np.asarray(maps_u8), images))
        pages, handle = payload
        return ("device", (pages, handle()))

    def fused_finish(self, materialized, pages_by_path: dict) -> None:
        """Pure host tail: classification + XML write for one materialized
        group — safe to overlap the next group's device execution."""
        from citlab_as_tpu.utils.faults import page_guard
        kind, payload = materialized
        if kind == "host":
            chunk, maps_np, images = payload
            for image_path, net_u8, image in zip(chunk, maps_np, images):
                def finish_one(image_path=image_path, net_u8=net_u8,
                               image=image):
                    net_output_post = net_u8 / 255.0
                    swt_feature_image = self.swt.distance_transform(
                        image, cache_key=image_path)
                    page_path = self._page_path_for(image_path)
                    writer = RegionToPageWriter(
                        page_path, path_to_image=image_path,
                        fixed_height=self.fixed_height,
                        scaling_factor=self.scaling_factor)
                    self.classify_page(writer.page_object, writer.scaling_factor,
                                       net_output_post, swt_feature_image,
                                       save_features_key=page_path + self.save_suffix)
                    writer.save_page_xml(page_path + self.save_suffix)
                    pages_by_path[image_path] = writer.page_object
                page_guard(self.on_page_error, image_path, "heading",
                           finish_one)
            return

        net_on = self.weight_dict["net"] > 0
        pages, results = payload
        for page_entry, (netp, sw_th) in zip(pages, results):
            if page_entry is None:    # skipped at fused_drain_dispatch
                continue
            image_path, page_path, writer, text_lines = page_entry

            def finish_one(image_path=image_path, page_path=page_path,
                           writer=writer, text_lines=text_lines,
                           netp=netp, sw_th=sw_th):
                net_prob, sw_raw, th_raw = {}, {}, {}
                saved = {}
                for j, tl in enumerate(text_lines):
                    net_prob[tl.id] = float(netp[j]) if net_on else 0.0
                    sw_raw[tl.id] = float(sw_th[j, 0])
                    th_raw[tl.id] = int(sw_th[j, 1])
                    if tl.surr_p is not None:
                        bb = tl.surr_p.to_polygon().get_bounding_box()
                        saved[tl.id] = ((bb.x, bb.y, bb.width, bb.height),
                                        sw_raw[tl.id], th_raw[tl.id])
                self.line_features_by_page[page_path + self.save_suffix] = saved
                self.classify_from_features(writer.page_object, text_lines,
                                            net_prob, sw_raw, th_raw)
                writer.save_page_xml(page_path + self.save_suffix)
                pages_by_path[image_path] = writer.page_object
            page_guard(self.on_page_error, image_path, "heading", finish_one)

    def fused_drain_finish(self, state, pages_by_path: dict) -> None:
        """Materialize + classify one group (see the split halves)."""
        self.fused_finish(self.fused_materialize(state), pages_by_path)

    def fused_drain(self, entry, pages_by_path: dict) -> None:
        """Materialize one group's heading results; classification + XML on
        host. Device-SWT path: the DT / probability images never leave the
        device — only [n_lines, 3] scalars per page are read back."""
        self.fused_drain_finish(self.fused_drain_dispatch(entry),
                                pages_by_path)

    def run_batched_fused(self, batch_size: int = 4) -> List:
        """Fused device path (see :func:`make_fused_heading_fn`): uint8
        originals up, quantized uint8 heading maps down; classification +
        XML host work of group i-1 overlaps group i's device programs.

        Queue discipline (axon tunnel, ROUND3_NOTES.md): each group's
        readback happens IMMEDIATELY after its own dispatch chain, before
        any further dispatch or upload — a readback racing later-enqueued
        programs or an in-flight upload deterministically poisons the
        client with INVALID_ARGUMENT. The previous group's pure-host tail
        (classification + XML write) is deferred to just after the next
        group's big dispatch, so it overlaps that group's device
        execution instead."""
        from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

        pages_by_path: dict = {}
        pending = None
        max_batch = min(batch_size,
                        getattr(self.predict_fn, "MAX_DEVICE_BATCH", batch_size))
        groups = SeparatorNetPostProcessor.group_by_shape(
            self.image_paths, max_batch, on_error=self.on_page_error)
        for images, chunk in groups:
            entry = self.fused_dispatch(images, chunk, max_batch)
            if pending is not None:
                # overlaps the big program just dispatched
                self.fused_finish(pending, pages_by_path)
            state = self.fused_drain_dispatch(entry)
            pending = self.fused_materialize(state)
        if pending is not None:
            self.fused_finish(pending, pages_by_path)
        # stage end: all chains barriered + materialized, queue quiet ->
        # safe point to drop the pinned group buffers
        from citlab_as_tpu.ops.device_hold import release
        release()
        return [pages_by_path[p] for p in self.image_paths]
