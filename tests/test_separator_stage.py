"""Separator stage end-to-end: synthetic net -> masks -> polygons -> PAGE-XML
with text-line splitting (the reference pipeline's stage 1 contract)."""
import os

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.pagexml import Page
from citlab_as_tpu.stages.separator import (
    SeparatorNetPostProcessor, apply_threshold, separator_post_process,
    masks_to_polygons, rescale_polygons_dict,
)

H, W = 300, 400


def _make_net_output(h=H, w=W):
    """Synthetic separator probability map: one horizontal rule, one vertical
    rule, one small noise blob. Channel 0 = separator, channel 1 = other."""
    prob = np.zeros((h, w, 2), np.float32)
    prob[150:153, 20:380, 0] = 0.9      # horizontal separator
    prob[10:290, 200:204, 0] = 0.9      # vertical separator
    prob[50:52, 50:52, 0] = 0.9         # small noise (< 100 px)
    prob[..., 1] = 1.0 - prob[..., 0]
    return prob


def test_apply_threshold_uint8_scaling():
    arr = np.array([10, 20, 200], np.uint8)
    out = apply_threshold(arr, 0.05)  # threshold scaled to 12.75
    assert out.tolist() == [0, 255, 255]


def test_separator_post_process_masks():
    prob = _make_net_output()
    binary = apply_threshold(np.uint8(prob[..., 0] * 255), 0.05)
    masks = separator_post_process(binary)
    h_mask, v_mask = masks["horizontal"], masks["vertical"]
    # horizontal line in horizontal mask, not in vertical
    assert h_mask[151, 100] == 255
    assert v_mask[151, 100] == 0
    # vertical line in vertical mask
    assert v_mask[100, 201] == 255
    # overlap subtracted from horizontal
    assert h_mask[151, 201] == 0
    # noise blob removed (CC < 100 px)
    assert h_mask[50, 50] == 0 and v_mask[50, 50] == 0


def test_masks_to_polygons_and_rescale():
    mask = np.zeros((50, 50), np.uint8)
    mask[10:12, 5:45] = 255
    d = masks_to_polygons(mask, "horizontal")
    assert "SeparatorRegion_horizontal" in d
    assert len(d["SeparatorRegion_horizontal"]) == 1
    d2 = rescale_polygons_dict(d, 2.0)
    ring = d2["SeparatorRegion_horizontal"][0][0]
    xs = [p[0] for p in ring]
    assert max(xs) == 90  # 45 * 2


PAGE_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="{img}" imageWidth="{w}" imageHeight="{h}">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="20,100 380,100 380,140 20,140"/>
      <TextLine id="tl_1">
        <Coords points="20,100 380,100 380,140 20,140"/>
        <Baseline points="20,130 380,130"/>
        <TextEquiv><Unicode>straddling line</Unicode></TextEquiv>
      </TextLine>
      <TextLine id="tl_2">
        <Coords points="20,250 180,250 180,280 20,280"/>
        <Baseline points="20,270 180,270"/>
        <TextEquiv><Unicode>left only</Unicode></TextEquiv>
      </TextLine>
    </TextRegion>
  </Page>
</PcGts>
"""


@pytest.fixture
def workdir(tmp_path):
    img = np.full((H, W), 255, np.uint8)
    img_path = tmp_path / "p1.png"
    Image.fromarray(img).save(img_path)
    page_dir = tmp_path / "page"
    page_dir.mkdir()
    (page_dir / "p1.xml").write_text(
        PAGE_TEMPLATE.format(img="p1.png", w=W, h=H))
    return tmp_path


def test_separator_stage_end_to_end(workdir):
    def predict_fn(image_grey):
        assert image_grey.shape == (H, W)
        return _make_net_output()

    proc = SeparatorNetPostProcessor(
        [str(workdir / "p1.png")], predict_fn,
        fixed_height=None, scaling_factor=1.0, threshold=0.05)
    pages = proc.run()
    assert len(pages) == 1

    out_path = str(workdir / "page" / "p1.xml.xml")
    assert os.path.exists(out_path)
    page = Page(out_path)

    regions = page.get_regions()
    seps = regions["SeparatorRegion"]
    orientations = {s.get_orientation() for s in seps}
    assert orientations == {"horizontal", "vertical"}

    # the straddling text line got split in two at the vertical separator
    tls = page.get_textlines()
    ids = sorted(tl.id for tl in tls)
    assert "tl_1_1" in ids and "tl_1_2" in ids
    assert "tl_2" in ids  # untouched line survives
    assert "tl_1" not in ids

    split_lines = [tl for tl in tls if tl.id.startswith("tl_1_")]
    for tl in split_lines:
        assert tl.baseline is not None
        xs = [x for x, _ in tl.surr_p.points_list]
        # each split lies entirely on one side of the separator (x ~ 200-204)
        assert max(xs) <= 205 or min(xs) >= 199

    # baselines clipped: one ends before 200, other starts after 204
    bl_xs = sorted((min(x for x, _ in tl.baseline.points_list),
                    max(x for x, _ in tl.baseline.points_list))
                   for tl in split_lines)
    assert bl_xs[0][1] <= 205
    assert bl_xs[1][0] >= 199


def test_separator_stage_creates_page_if_missing(tmp_path):
    img = np.full((H, W), 255, np.uint8)
    img_path = tmp_path / "p2.png"
    Image.fromarray(img).save(img_path)

    proc = SeparatorNetPostProcessor(
        [str(img_path)], lambda g: _make_net_output(),
        fixed_height=None, scaling_factor=1.0, threshold=0.05)
    proc.run()
    out_path = str(tmp_path / "page" / "p2.xml.xml")
    assert os.path.exists(out_path)
    page = Page(out_path)
    assert len(page.get_regions()["SeparatorRegion"]) >= 2


def test_run_batched_pipelined_matches_run(tmp_path):
    """run_batched (dispatch-ahead pipelining) writes the same pages as the
    per-image run() path."""
    import os
    from PIL import Image
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        img = np.full((96, 128), 255, np.uint8)
        img[8:88, 60 + i:64 + i] = 0   # vertical separator, varying x
        p = tmp_path / f"pp{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32, seed=1)

    proc_a = SeparatorNetPostProcessor(paths, pred, fixed_height=None,
                                       threshold=0.3)
    proc_a.run_batched(batch_size=2)
    batched = {}
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"pp{i}.xml.xml"))
        batched[i] = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        os.remove(str(tmp_path / "page" / f"pp{i}.xml.xml"))

    proc_b = SeparatorNetPostProcessor(paths, pred, fixed_height=None,
                                       threshold=0.3)
    proc_b.run()
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"pp{i}.xml.xml"))
        single = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        assert single == batched[i]


@pytest.mark.slow
def test_run_batched_fused_matches_run(tmp_path):
    """The fully fused device pipeline (uint8 in, bit-packed masks out)
    writes the same separator regions as the per-image run() path."""
    import os
    from PIL import Image
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    paths = []
    for i in range(3):
        img = np.full((96, 128), 255, np.uint8)
        img[8:88, 60 + i:64 + i] = 0
        p = tmp_path / f"fz{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32, seed=1)

    proc_a = SeparatorNetPostProcessor(paths, pred, fixed_height=None,
                                       threshold=0.3)
    proc_a.run_batched_fused(batch_size=2)
    fused = {}
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"fz{i}.xml.xml"))
        fused[i] = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        os.remove(str(tmp_path / "page" / f"fz{i}.xml.xml"))

    proc_b = SeparatorNetPostProcessor(paths, pred, fixed_height=None,
                                       threshold=0.3)
    proc_b.run()
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"fz{i}.xml.xml"))
        single = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        assert single == fused[i]


@pytest.mark.slow
def test_run_batched_fused_with_resize(tmp_path):
    """Fused path with an actual on-device resize (fixed_height < original)
    matches run(); mixed original shapes are grouped correctly."""
    import os
    from PIL import Image
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    paths = []
    shapes = [(128, 96), (128, 96), (144, 112)]
    for i, (h, w) in enumerate(shapes):
        img = np.full((h, w), 255, np.uint8)
        img[8:h - 8, w // 2 - 2:w // 2 + 2] = 0
        p = tmp_path / f"fr{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32, seed=1)

    proc_a = SeparatorNetPostProcessor(paths, pred, fixed_height=96,
                                       threshold=0.3)
    proc_a.run_batched_fused(batch_size=3)
    fused = {}
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"fr{i}.xml.xml"))
        fused[i] = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        os.remove(str(tmp_path / "page" / f"fr{i}.xml.xml"))

    proc_b = SeparatorNetPostProcessor(paths, pred, fixed_height=96,
                                       threshold=0.3)
    proc_b.run()
    for i in range(3):
        page = Page(str(tmp_path / "page" / f"fr{i}.xml.xml"))
        single = sorted(
            s.points.to_string()
            for s in page.get_regions().get("SeparatorRegion", []))
        assert single == fused[i]


def test_native_post_matches_device_chain():
    """gk_separator_post (run-space CC + openings in C) is bit-identical to
    the device chain (scipy-CC oracle + jitted morphology) across kernel
    parities, border-touching runs, and min_size settings."""
    import jax.numpy as jnp
    from citlab_as_tpu.geometry.native import (native_available,
                                               separator_post_native)
    from citlab_as_tpu.stages.separator import (
        _remove_small_components_host, _separator_morphology_device)

    if not native_available():
        pytest.skip("native kernel unavailable")
    rng = np.random.RandomState(7)
    for trial in range(10):
        h, w = rng.randint(40, 160), rng.randint(40, 160)
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(1, 5)):
            x = rng.randint(0, w)
            m[rng.randint(0, h // 2):rng.randint(h // 2, h),
              max(0, x - 1):x + 1] = 255
        for _ in range(rng.randint(1, 5)):
            y = rng.randint(0, h)
            m[max(0, y - 1):y + 1,
              rng.randint(0, w // 2):rng.randint(w // 2, w)] = 255
        m[rng.rand(h, w) < 0.02] = 255
        if trial % 2 == 0:     # border-touching short runs
            m[0, :rng.randint(3, 15)] = 255
            m[:rng.randint(3, 15), -1] = 255
        hk, vk, nk = rng.randint(1, 33), rng.randint(1, 33), rng.randint(1, 15)
        ms = int(rng.choice([1, 5, 100]))
        cleaned = _remove_small_components_host(m, ms)
        dh, dv = _separator_morphology_device(jnp.asarray(cleaned), hk, vk, nk)
        nh, nv = separator_post_native(m, ms, hk, vk, nk)
        assert (nv == np.asarray(dv)).all(), (trial, hk, vk, nk, ms)
        assert (nh == np.asarray(dh)).all(), (trial, hk, vk, nk, ms)
        # packed-bits entry point (what the drain feeds straight from the
        # device readback): identical to the dense entry point
        from citlab_as_tpu.geometry.native import separator_post_native_packed
        packed = np.packbits(m > 0, axis=1)
        ph, pv = separator_post_native_packed(packed, w, ms, hk, vk, nk)
        assert (ph == nh).all() and (pv == nv).all(), (trial, hk, vk, nk, ms)


def test_fused_native_mode_matches_device_mode(tmp_path, monkeypatch):
    """run_batched_fused writes identical SeparatorRegions whether the
    CC/morphology post runs on device (CITLAB_SEP_POST=device) or through
    the native run-space kernel (default)."""
    from PIL import Image
    from citlab_as_tpu.geometry.native import native_available
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    if not native_available():
        pytest.skip("native kernel unavailable")
    paths = []
    for i in range(2):
        img = np.full((96, 128), 255, np.uint8)
        img[8:88, 60 + i:64 + i] = 0
        p = tmp_path / f"nm{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    pred = SegmentationPredictor(model_dir=None, pad_multiple=32, seed=1)

    results = {}
    for mode in ("device", "native"):
        monkeypatch.setenv("CITLAB_SEP_POST", mode)
        for i in range(2):
            out = tmp_path / "page" / f"nm{i}.xml.xml"
            if out.exists():
                os.remove(str(out))
        proc = SeparatorNetPostProcessor(paths, pred, fixed_height=None,
                                         threshold=0.3)
        proc.run_batched_fused(batch_size=2)
        results[mode] = [
            sorted(s.points.to_string() for s in
                   Page(str(tmp_path / "page" / f"nm{i}.xml.xml"))
                   .get_regions().get("SeparatorRegion", []))
            for i in range(2)]
    assert results["native"] == results["device"]
