"""Host-side contour tracing: binary mask -> ring polygons per component.

Replaces rasterio.features.shapes (region_net_post_processor_base.py:178-197).
Output matches its contract: per 8-connected component a list of closed rings
in pixel-corner coordinates [(x, y), ...] — exterior ring first, then holes.

The boundary-edge extraction is vectorized numpy; only the ring chaining is a
Python loop over boundary edges (output is irreducibly irregular — this is
exactly the work SURVEY.md keeps on host).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

Point = Tuple[int, int]
Ring = List[Point]

# turn preference at pinch corners: sharpest LEFT turn first, so diagonal
# (8-connected) neighbors stay on one ring
_DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}
_DIR_VECS = [(1, 0), (0, 1), (-1, 0), (0, -1)]


def _boundary_edges(mask: np.ndarray, labels: np.ndarray):
    """Directed boundary edges with owning pixel label.

    Convention (y-down image coords): exterior rings wind so the shoelace
    area is positive; holes negative.
    Returns dict start_point -> list of (end_point, dir_idx, label).
    """
    h, w = mask.shape
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask

    edges: Dict[Point, List[Tuple[Point, int, int]]] = {}

    def add(r, c, p0, p1, dir_vec):
        edges.setdefault(p0, []).append((p1, _DIRS[dir_vec], int(labels[r, c])))

    # top edges: empty above -> walk +x
    rs, cs = np.nonzero(padded[1:-1, 1:-1] & ~padded[:-2, 1:-1])
    for r, c in zip(rs.tolist(), cs.tolist()):
        add(r, c, (c, r), (c + 1, r), (1, 0))
    # right edges: empty right -> walk +y
    rs, cs = np.nonzero(padded[1:-1, 1:-1] & ~padded[1:-1, 2:])
    for r, c in zip(rs.tolist(), cs.tolist()):
        add(r, c, (c + 1, r), (c + 1, r + 1), (0, 1))
    # bottom edges: empty below -> walk -x
    rs, cs = np.nonzero(padded[1:-1, 1:-1] & ~padded[2:, 1:-1])
    for r, c in zip(rs.tolist(), cs.tolist()):
        add(r, c, (c + 1, r + 1), (c, r + 1), (-1, 0))
    # left edges: empty left -> walk -y
    rs, cs = np.nonzero(padded[1:-1, 1:-1] & ~padded[1:-1, :-2])
    for r, c in zip(rs.tolist(), cs.tolist()):
        add(r, c, (c, r + 1), (c, r), (0, -1))

    return edges


def _chain_rings(edges) -> List[Tuple[Ring, int, float]]:
    """Chain directed edges into closed rings. Returns (ring, label,
    signed_area) triples; ring is closed (first == last)."""
    rings = []
    while edges:
        start = next(iter(edges))
        end, dir_idx, label = edges[start].pop()
        if not edges[start]:
            del edges[start]
        ring = [start, end]
        cur_dir = dir_idx
        while ring[-1] != start:
            cands = edges.get(ring[-1])
            if not cands:
                break  # malformed (shouldn't happen on valid masks)
            if len(cands) == 1:
                nxt = cands.pop(0)
            else:
                # pinch corner: prefer sharpest left turn (8-connectivity)
                def turn_score(c):
                    return (c[1] - cur_dir + 1) % 4  # left=0, straight=1, right=2
                cands.sort(key=turn_score)
                nxt = cands.pop(0)
            if not edges[ring[-1]]:
                del edges[ring[-1]]
            if nxt[1] == cur_dir:
                # collinear continuation: extend the current run in place.
                # Identical polygon as a point set (rasterio's polygonize
                # also emits minimal rectilinear rings); keeps ring sizes
                # O(corners) instead of O(perimeter), which the downstream
                # geometry (clipping, XML coords) depends on for speed.
                ring[-1] = nxt[0]
            else:
                ring.append(nxt[0])
            cur_dir = nxt[1]
        # signed area (shoelace)
        area = 0.0
        for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
            area += x1 * y2 - x2 * y1
        rings.append((ring, label, area / 2.0))
    return rings


def trace_contours(binary, labels=None) -> List[List[Ring]]:
    """Ring polygons of the 8-connected components of ``binary`` (255/0 or
    bool). Returns one entry per component: [exterior_ring, *hole_rings]."""
    mask = np.asarray(binary) != 0
    if not mask.any():
        return []
    if labels is None:
        # labels are only needed to GROUP hole rings with their component's
        # exterior; that grouping falls out of ring nesting (a hole's
        # innermost enclosing exterior ring IS its component's exterior —
        # any other component inside that exterior lives inside one of its
        # holes and therefore cannot enclose this hole), so the full-image
        # connected-component labeling (~30 ms/page at 1500x1000, the
        # single largest cost of the separator host tail) is skipped
        return _group_rings_by_nesting(_chain_rings_fast(mask, None))
    labels = np.asarray(labels)

    rings = _chain_rings_fast(mask, labels)

    by_label: Dict[int, List[Tuple[Ring, float]]] = {}
    order: List[int] = []
    for ring, label, area in rings:
        if label not in by_label:
            order.append(label)
        by_label.setdefault(label, []).append((ring, area))

    out = []
    for label in sorted(order):
        comp = by_label[label]
        exteriors = [r for r, a in comp if a > 0]
        holes = [r for r, a in comp if a <= 0]
        # a component has exactly one exterior; keep largest as safety
        exteriors.sort(key=lambda r: -abs(_ring_area(r)))
        out.append([exteriors[0]] + holes if exteriors else [comp[0][0]])
    return out


def _group_rings_by_nesting(rings) -> List[List[Ring]]:
    """[exterior, *holes] per component without a label image.

    Component ORDER matches the labeled path (scipy's row-major
    first-pixel numbering): ring discovery in :func:`_chain_rings_fast`
    starts from the smallest corner-edge index of each ring; for an
    exterior that is the top edge of its component's topmost-leftmost
    pixel, and top edges come first in the edge arrays in row-major order
    — so exteriors are discovered exactly in first-pixel row-major order.

    Hole assignment: a half-integer point strictly inside the hole (the
    cell below-right of the hole ring's topmost-leftmost vertex) is tested
    against enclosing exteriors; the innermost (smallest-area) containing
    exterior is the component's. Half-integer coordinates can never lie ON
    a crack ring (rectilinear, integer coords), so the even-odd test is
    exact."""
    from citlab_as_tpu.geometry.booleans import point_in_ring

    exteriors: List[Tuple[Ring, float]] = []
    holes: List[Ring] = []
    for ring, _lab, area in rings:
        (exteriors if area > 0 else holes).append(
            (ring, area) if area > 0 else ring)
    comps: List[List[Ring]] = [[ext] for ext, _ in exteriors]
    extra: List[List[Ring]] = []
    if holes:
        bboxes = []
        for ext, _ in exteriors:
            arr = np.asarray(ext, np.float64)
            bboxes.append((arr[:, 0].min(), arr[:, 1].min(),
                           arr[:, 0].max(), arr[:, 1].max()))
        for hole in holes:
            vx, vy = min(hole[:-1], key=lambda p: (p[1], p[0]))
            px, py = vx + 0.5, vy + 0.5
            best, best_area = None, None
            for i, (ext, area) in enumerate(exteriors):
                x0, y0, x1, y1 = bboxes[i]
                if not (x0 < px < x1 and y0 < py < y1):
                    continue
                if ((best_area is None or area < best_area)
                        and point_in_ring((px, py), ext)):
                    best, best_area = i, area
            if best is None:          # malformed mask: emit standalone
                extra.append([hole])
            else:
                comps[best].append(hole)
    return comps + extra


def _ring_area(ring: Ring) -> float:
    area = 0.0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        area += x1 * y2 - x2 * y1
    return area / 2.0


def _chain_rings_fast(mask: np.ndarray, labels=None
                      ) -> List[Tuple[Ring, int, float]]:
    """Vectorized ring chaining: crack edges as arrays, successor assignment
    via one sort + searchsorted (pinch corners resolved by the same
    sharpest-left-turn rule as :func:`_chain_rings`), collinear runs skipped
    with pointer doubling, then a Python walk over CORNER edges only. The
    per-boundary-pixel dict work of the fallback chainer dominated the
    separator stage (~50 ms/page); this is O(E log E) numpy + O(corners)
    Python.
    """
    h, w = mask.shape
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask
    stride = w + 2

    # one sparse foreground scan + neighbor gathers at those K points —
    # building a full-frame boolean selector per direction (8 H x W
    # temporaries + 4 scans) dominated this function on sparse masks;
    # the scan itself goes through the C kernel when available
    # (np.nonzero's two generic passes cost ~3.5 ms/page on this host)
    from citlab_as_tpu.geometry.native import nonzero2d_native
    rc = nonzero2d_native(mask)
    frs, fcs = rc if rc is not None else np.nonzero(mask)
    flabs = (labels[frs, fcs] if labels is not None
             else np.zeros(frs.shape[0], np.int32))
    nb_top = padded[frs, fcs + 1]
    nb_right = padded[frs + 1, fcs + 2]
    nb_bottom = padded[frs + 2, fcs + 1]
    nb_left = padded[frs + 1, fcs]

    starts, ends, dirs, labs = [], [], [], []

    def add(nb, s_dx, s_dy, e_dx, e_dy, d):
        idx = np.flatnonzero(~nb)   # row-major order, as np.nonzero gave
        rs, cs = frs[idx], fcs[idx]
        starts.append((rs + s_dy) * stride + (cs + s_dx))
        ends.append((rs + e_dy) * stride + (cs + e_dx))
        dirs.append(np.full(idx.shape[0], d, np.int8))
        labs.append(flabs[idx])

    add(nb_top, 0, 0, 1, 0, 0)       # top: walk +x
    add(nb_right, 1, 0, 1, 1, 1)     # right: walk +y
    add(nb_bottom, 1, 1, 0, 1, 2)    # bottom: walk -x
    add(nb_left, 0, 1, 0, 0, 3)      # left: walk -y

    S = np.concatenate(starts)
    E = np.concatenate(ends)
    D = np.concatenate(dirs).astype(np.int16)
    L = np.concatenate(labs)
    n = S.shape[0]
    if n == 0:
        return []

    # successor: the edge starting where this one ends; at pinch corners
    # (two candidates) take the sharpest left turn
    order = np.argsort(S, kind="stable")
    s_sorted = S[order]
    lo = np.searchsorted(s_sorted, E, "left")
    hi = np.searchsorted(s_sorted, E, "right")
    succ = order[np.minimum(lo, n - 1)]
    two = np.flatnonzero(hi - lo == 2)
    if two.size:
        c0 = order[lo[two]]
        c1 = order[lo[two] + 1]
        cur = D[two]
        s0 = (D[c0] - cur + 1) % 4
        s1 = (D[c1] - cur + 1) % 4
        succ[two] = np.where(s0 <= s1, c0, c1)

    pred = np.empty(n, np.int64)
    pred[succ] = np.arange(n)
    is_corner = D != D[pred]

    # next-corner pointers: first successor whose direction differs
    ptr = succ.copy()
    done = D[ptr] != D
    while True:
        nd = np.flatnonzero(~done)
        if nd.size == 0:
            break
        p = ptr[nd]
        done[nd] = done[p]
        ptr[nd] = ptr[p]

    rings: List[Tuple[Ring, int, float]] = []
    visited = np.zeros(n, dtype=bool)
    for c0 in np.flatnonzero(is_corner):
        if visited[c0]:
            continue
        chain = []
        c = int(c0)
        while not visited[c]:
            visited[c] = True
            chain.append(c)
            c = int(ptr[c])
        pts: Ring = [(int(S[c] % stride), int(S[c] // stride)) for c in chain]
        pts.append(pts[0])
        xs = np.asarray([p[0] for p in pts], np.float64)
        ys = np.asarray([p[1] for p in pts], np.float64)
        area = float(np.dot(xs[:-1], ys[1:]) - np.dot(xs[1:], ys[:-1])) / 2.0
        rings.append((pts, int(L[c0]), area))
    return rings
