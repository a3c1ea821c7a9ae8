"""Device SWT line features vs the host scipy path (exact parity).

The heading stage's per-line features (stroke width = median of per-CC-bbox
max DT, text height = max CC height, mean net probability over the scaled
bbox) move to device in round 3; these tests pin the device programs to the
host reference implementation (ops/swt.py textline_features semantics,
mirroring heading_net_post_processor.py:211-245)."""
import numpy as np
import jax.numpy as jnp
import pytest

from citlab_as_tpu.ops.swt import StrokeWidthDistanceTransform
from citlab_as_tpu.ops.swt_device import (
    DeviceLineFeatures, net_prob_means, swt_line_stats)


def _random_dt(rng, h, w, n_blobs=200, speck_p=0.01):
    dt = np.zeros((h, w), np.uint8)
    for _ in range(n_blobs):
        y, x = rng.randint(0, h - 20), rng.randint(0, w - 20)
        bh, bw = rng.randint(1, 18), rng.randint(1, 18)
        dt[y:y + bh, x:x + bw] = rng.randint(1, 14)
    dt[rng.rand(h, w) < speck_p] = rng.randint(1, 5)
    return dt


def _random_boxes(rng, h, w, n):
    boxes = []
    for _ in range(n):
        y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
        bh, bw = rng.randint(3, 70), rng.randint(5, 120)
        boxes.append((x, y, bw, bh))   # may overshoot the image edge: clips
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_swt_line_stats_matches_host(seed):
    rng = np.random.RandomState(seed)
    dt = _random_dt(rng, 300, 400)
    # a huge blob (cleaned by size) and an extreme-aspect bar (cleaned)
    dt[100:130, 50:330] = 2      # w=280 kept; aspect 280/30 > 8 -> cleaned
    boxes = _random_boxes(rng, 300, 400, 24)
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    host = np.array([swt.textline_features(dt, b) for b in boxes])
    dev = np.asarray(swt_line_stats(
        jnp.asarray(dt), jnp.asarray(np.asarray(boxes, np.int32)),
        crop_h=128, crop_w=256))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_swt_line_stats_empty_and_full():
    dt = np.zeros((100, 200), np.uint8)
    dt[40:60, 80:120] = 5
    boxes = np.asarray([
        (0, 0, 30, 30),      # empty crop -> (0, 0)
        (70, 30, 60, 40),    # contains the blob
        (150, 80, 80, 40),   # overshoots both edges
    ], np.int32)
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    host = np.array([swt.textline_features(dt, tuple(b)) for b in boxes])
    dev = np.asarray(swt_line_stats(jnp.asarray(dt), jnp.asarray(boxes),
                                    crop_h=64, crop_w=128))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_net_prob_means_matches_host():
    rng = np.random.RandomState(3)
    prob = rng.randint(0, 256, (200, 300)).astype(np.uint8)
    post = prob / 255.0
    boxes = _random_boxes(rng, 200, 300, 20) + [(10, 10, 0, 5)]  # degenerate
    host = []
    for x, y, bw, bh in boxes:
        if bw <= 0 or bh <= 0:
            host.append(0.0)
            continue
        crop = post[y:y + bh, x:x + bw]
        host.append(float(np.sum(crop) / (bw * bh)))
    dev = np.asarray(net_prob_means(
        jnp.asarray(prob), jnp.asarray(np.asarray(boxes, np.int32)),
        crop_h=128, crop_w=256))
    np.testing.assert_allclose(dev, host, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 5])
def test_swt_line_stats_batch_gather_matches_map(seed):
    """The gather-formulated group program (no lax.map / dynamic_slice —
    the relay-poisoned shape, ROUND3_NOTES.md) is bit-equal to the map
    variant and to the host path."""
    from citlab_as_tpu.ops.swt_device import (
        swt_line_stats_batch, swt_line_stats_batch_gather)
    rng = np.random.RandomState(seed)
    b, l = 3, 8
    dts = np.stack([_random_dt(rng, 220, 330) for _ in range(b)])
    boxes = np.zeros((b, l, 4), np.int32)
    for i in range(b):
        boxes[i] = np.asarray(_random_boxes(rng, 220, 330, l), np.int32)
    via_map = np.asarray(swt_line_stats_batch(
        jnp.asarray(dts), jnp.asarray(boxes), crop_h=128, crop_w=256))
    via_gather = np.asarray(swt_line_stats_batch_gather(
        jnp.asarray(dts), jnp.asarray(boxes), crop_h=128, crop_w=256,
        chunk=8))  # small chunk -> exercises the multi-chunk static loop
    np.testing.assert_array_equal(via_gather, via_map)
    from citlab_as_tpu.ops.swt_device import swt_line_stats_batch_gather2
    via_mxu = np.asarray(swt_line_stats_batch_gather2(
        jnp.asarray(dts), jnp.asarray(boxes), crop_h=128, crop_w=256,
        chunk=8))  # one-hot-matmul column extraction
    np.testing.assert_array_equal(via_mxu, via_map)
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    host = np.array([[swt.textline_features(dts[i], tuple(boxes[i, j]))
                      for j in range(l)] for i in range(b)])
    np.testing.assert_allclose(via_gather, host, atol=1e-6)


def test_net_prob_sums_batch_sat_matches_map():
    """SAT 4-corner sums == crop-and-sum, including clipped/degenerate
    boxes."""
    from citlab_as_tpu.ops.swt_device import (
        net_prob_sums_batch, net_prob_sums_batch_sat)
    rng = np.random.RandomState(7)
    b = 3
    probs = rng.randint(0, 256, (b, 150, 210)).astype(np.uint8)
    boxes = np.zeros((b, 12, 4), np.int32)
    for i in range(b):
        boxes[i, :10] = np.asarray(_random_boxes(rng, 150, 210, 10), np.int32)
    boxes[0, 10] = (200, 140, 50, 40)   # overshoots both edges
    boxes[1, 10] = (10, 10, 0, 5)       # degenerate w=0
    boxes[2, 10] = (10, 149, 30, 1)     # last row
    # [b, :, 11] stays all-zero (padding rows)
    via_map = np.asarray(net_prob_sums_batch(
        jnp.asarray(probs), jnp.asarray(boxes), crop_h=128, crop_w=256))
    via_sat = np.asarray(net_prob_sums_batch_sat(
        jnp.asarray(probs), jnp.asarray(boxes)))
    np.testing.assert_array_equal(via_sat, via_map)
    # and against a direct numpy crop sum
    for i in range(b):
        for j in range(12):
            x, y, w, h = boxes[i, j]
            assert via_sat[i, j] == probs[i, y:y + h, x:x + w].astype(
                np.int64).sum()


def test_line_stats_native_matches_host():
    """The C kernel's per-line stats (gk_line_stats) are bit-equal to the
    host scipy path — including cleaning rules, inclusive-crop clipping and
    invalid (w<0) rows."""
    from citlab_as_tpu.geometry.native import line_stats_native, native_available
    if not native_available():
        pytest.skip("native kernel unavailable")
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    for seed in range(4):
        rng = np.random.RandomState(seed)
        dt = _random_dt(rng, 300, 400)
        dt[100:130, 50:330] = 2   # aspect > 8 -> cleaned
        boxes = _random_boxes(rng, 300, 400, 30)
        boxes += [(0, 0, 399, 299),       # whole image
                  (380, 290, 100, 100),   # overshoots both edges
                  (-1, -1, -1, -1),       # invalid marker
                  (5, 5, 0, 0)]           # degenerate (1x1 inclusive crop)
        boxes = np.asarray(boxes, np.int32)
        host = np.array([swt.textline_features(dt, tuple(b))
                         if b[2] >= 0 else (0.0, 0.0) for b in boxes])
        nat = line_stats_native(dt, boxes)
        np.testing.assert_allclose(nat, host, atol=1e-6)


@pytest.mark.parametrize("mode", ["gather", "gather2", "map", "native"])
def test_device_line_features_bridge_modes(mode, monkeypatch):
    """Both extraction modes of the bridge (gather default / legacy map
    chain) produce identical per-line features."""
    monkeypatch.setenv("CITLAB_SWT_EXTRACT", mode)
    rng = np.random.RandomState(6)
    dt = _random_dt(rng, 200, 280)
    prob = rng.randint(0, 256, (120, 170)).astype(np.uint8)
    swt_boxes = np.asarray(_random_boxes(rng, 200, 280, 7), np.int32)
    net_boxes = (swt_boxes * 0.6).astype(np.int32)
    feats = DeviceLineFeatures()
    netp, sw_th = feats(jnp.asarray(dt), jnp.asarray(prob),
                        swt_boxes, net_boxes)
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    post = prob / 255.0
    for i, (x, y, bw, bh) in enumerate(swt_boxes):
        hsw, hth = swt.textline_features(dt, (x, y, bw, bh))
        np.testing.assert_allclose(sw_th[i], [hsw, hth], atol=1e-6)
        nx, ny, nw, nh = net_boxes[i]
        crop = post[ny:ny + nh, nx:nx + nw]
        np.testing.assert_allclose(
            netp[i], np.sum(crop) / (nw * nh), atol=1e-5)


def test_device_line_features_bridge():
    rng = np.random.RandomState(4)
    dt = _random_dt(rng, 250, 350)
    prob = rng.randint(0, 256, (150, 210)).astype(np.uint8)
    swt_boxes = np.asarray(_random_boxes(rng, 250, 350, 9), np.int32)
    net_boxes = (swt_boxes * 0.6).astype(np.int32)
    # one invalid line (no surrounding polygon)
    swt_boxes[4] = (-1, -1, -1, -1)
    net_boxes[4] = (-1, -1, -1, -1)

    feats = DeviceLineFeatures()
    netp, sw_th = feats(jnp.asarray(dt), jnp.asarray(prob),
                        swt_boxes, net_boxes)

    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    post = prob / 255.0
    for i, (x, y, bw, bh) in enumerate(swt_boxes):
        if bw < 0:
            assert netp[i] == 0.0 and tuple(sw_th[i]) == (0.0, 0.0)
            continue
        hsw, hth = swt.textline_features(dt, (x, y, bw, bh))
        np.testing.assert_allclose(sw_th[i], [hsw, hth], atol=1e-6)
        nx, ny, nw, nh = net_boxes[i]
        crop = post[ny:ny + nh, nx:nx + nw]
        np.testing.assert_allclose(
            netp[i], np.sum(crop) / (nw * nh), atol=1e-5)


def test_device_line_features_zero_line_page():
    """A group containing a page with NO text lines must not break the
    batched dispatch (empty [0, 4] box arrays)."""
    dt = np.zeros((100, 150), np.uint8)
    prob = np.zeros((60, 90), np.uint8)
    feats = DeviceLineFeatures()
    out = feats.dispatch_batch(
        jnp.asarray(dt)[None].repeat(2, 0),
        jnp.asarray(prob)[None].repeat(2, 0),
        [np.zeros((0, 4), np.int32), np.asarray([[5, 5, 20, 10]], np.int32)],
        [np.zeros((0, 4), np.int32), np.asarray([[3, 3, 12, 6]], np.int32)])()
    assert out[0][0].shape == (0,) and out[0][1].shape == (0, 2)
    assert out[1][0].shape == (1,) and out[1][1].shape == (1, 2)


@pytest.mark.parametrize("stride", [8, 32])
def test_stride_capped_fixpoint_exact(stride):
    """VERDICT r4 item 5 (perf ladder): the stride-capped propagation
    (CITLAB_SWT_STRIDE) reaches the SAME fixpoint as full-width doubling —
    the convergence check absorbs the shorter per-sweep reach. Includes a
    full-crop-width run (an in-crop separator fragment, the case a capped
    sweep needs extra outer iterations for) and host-oracle parity."""
    from citlab_as_tpu.ops.swt_device import line_features_batch

    rng = np.random.RandomState(5)
    h, w = 220, 600
    dt = _random_dt(rng, h, w)
    dt[100, :] = 3                      # full-width 1-px run
    dt[140:143, 30:560] = 2            # long 3-px-tall bar
    boxes = []                          # bucket contract: bh + 1 <= crop_h
    for _ in range(17):
        y, x = rng.randint(0, h - 10), rng.randint(0, w - 10)
        bh, bw = rng.randint(3, 30), rng.randint(5, 300)
        boxes.append((x, y, bw, bh))
    boxes = np.asarray(boxes
                       + [(0, 90, 599, 20), (20, 130, 550, 20)], np.int32)
    swt = StrokeWidthDistanceTransform(dark_on_bright=True)
    host = np.array([swt.textline_features(dt, tuple(b)) for b in boxes])

    dtb = jnp.asarray(dt[None])
    sb = jnp.asarray(boxes[None])
    prob = jnp.zeros((1, h, w), jnp.uint8)
    for mxu in (False, True):
        full = np.asarray(line_features_batch(
            dtb, prob, sb, sb, crop_h=32, crop_w=600, mxu=mxu, stride=0))
        capped = np.asarray(line_features_batch(
            dtb, prob, sb, sb, crop_h=32, crop_w=600, mxu=mxu,
            stride=stride))
        np.testing.assert_array_equal(full, capped)
        np.testing.assert_allclose(capped[0, :, 1] / 2.0, host[:, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(capped[0, :, 2], host[:, 1], atol=1e-6)


def test_serpentine_component_converges_capped():
    """A serpentine component whose internal 8-connected path is far longer
    than 64 * stride px: the fixpoint's iteration bound must be a pure
    safety net (h*w), not a fixed 64 — with stride=8 and ~20 full-width
    switchback rows the old cap truncated propagation mid-path and returned
    silently wrong per-component stats."""
    from citlab_as_tpu.ops.swt_device import component_stats_u16

    h, w = 42, 400
    dt = np.zeros((h, w), np.int32)
    # switchback snake: full-width rows joined alternately at the ends
    for i, y in enumerate(range(0, h, 2)):
        dt[y, :] = 1
        if y + 2 < h:
            dt[y + 1, w - 1 if i % 2 == 0 else 0] = 1
    crops = jnp.asarray(dt[None])
    fg = crops > 0
    lab0, mxx0, mnx0, mxy0 = (np.asarray(a) for a in
                              component_stats_u16(crops, fg, stride=0))
    lab8, mxx8, mnx8, mxy8 = (np.asarray(a) for a in
                              component_stats_u16(crops, fg, stride=8))
    # ONE component: every fg pixel agrees on root/extents in both modes
    m = dt > 0
    assert np.unique(lab0[0][m]).size == 1
    np.testing.assert_array_equal(lab0[0][m], lab8[0][m])
    np.testing.assert_array_equal(mxx0[0][m], mxx8[0][m])
    np.testing.assert_array_equal(mnx0[0][m], mnx8[0][m])
    np.testing.assert_array_equal(mxy0[0][m], mxy8[0][m])
    assert mxx8[0][m].max() == w - 1 and mxy8[0][m].max() == h - 2
