"""Slow, loop-for-loop oracles with the reference's exact semantics.

These transliterate the reference's *Python fallback* algorithms (the ones
that cross-check the Java kernel in the original:
dbscan_baselines.py:63-110, geometry/util.py:831-902) so the vectorized
production kernels in citlab_as_tpu.geometry can be golden-tested against
them. Test-only code; never imported by the package.
"""
import math

from citlab_as_tpu.geometry.polygon import calc_reg_line_stats
from citlab_as_tpu.geometry.util import get_dist_fast, get_in_dist, get_off_dist


def interline_distances_loop(normed_polys, des_dist=5, max_d=500):
    out = []
    for poly_a in normed_polys:
        angle = calc_reg_line_stats(poly_a)[0]
        or_vec_y, or_vec_x = math.sin(angle), math.cos(angle)
        dist = max_d
        pt_a1 = [poly_a.x_points[0], poly_a.y_points[0]]
        pt_a2 = [poly_a.x_points[-1], poly_a.y_points[-1]]
        for x_a, y_a in zip(poly_a.x_points, poly_a.y_points):
            p_a = [x_a, y_a]
            for poly_b in normed_polys:
                if poly_b is poly_a:
                    continue
                if get_dist_fast(p_a, poly_b.get_bounding_box()) > dist:
                    continue
                pt_b1 = (poly_b.x_points[0], poly_b.y_points[0])
                pt_b2 = (poly_b.x_points[-1], poly_b.y_points[-1])
                in1 = get_in_dist(pt_a1, pt_b1, or_vec_x, or_vec_y)
                in2 = get_in_dist(pt_a1, pt_b2, or_vec_x, or_vec_y)
                in3 = get_in_dist(pt_a2, pt_b1, or_vec_x, or_vec_y)
                in4 = get_in_dist(pt_a2, pt_b2, or_vec_x, or_vec_y)
                if (in1 < 0 and in2 < 0 and in3 < 0 and in4 < 0) or (
                        in1 > 0 and in2 > 0 and in3 > 0 and in4 > 0):
                    continue
                for p_b in zip(poly_b.x_points, poly_b.y_points):
                    if abs(get_in_dist(p_a, p_b, or_vec_x, or_vec_y)) <= 2 * des_dist:
                        dist = min(dist, abs(get_off_dist(p_a, p_b, or_vec_x, or_vec_y)))
        out.append(dist if dist < max_d else max_d)
    return out


def calc_tols_loop(polys_truth, tick_dist=5, max_d=250, rel_tol=0.25):
    tols = []
    for poly_a in polys_truth:
        angle = calc_reg_line_stats(poly_a)[0]
        or_vec_y, or_vec_x = math.sin(angle), math.cos(angle)
        dist = max_d
        pt_a1 = [poly_a.x_points[0], poly_a.y_points[0]]
        pt_a2 = [poly_a.x_points[-1], poly_a.y_points[-1]]
        for x_a, y_a in zip(poly_a.x_points, poly_a.y_points):
            p_a = [x_a, y_a]
            for poly_b in polys_truth:
                if poly_b is poly_a:
                    continue
                if get_dist_fast(p_a, poly_b.get_bounding_box()) > dist:
                    continue
                pt_b1 = (poly_b.x_points[0], poly_b.y_points[0])
                pt_b2 = (poly_b.x_points[-1], poly_b.y_points[-1])
                in1 = get_in_dist(pt_a1, pt_b1, or_vec_x, or_vec_y)
                in2 = get_in_dist(pt_a1, pt_b2, or_vec_x, or_vec_y)
                in3 = get_in_dist(pt_a2, pt_b1, or_vec_x, or_vec_y)
                in4 = get_in_dist(pt_a2, pt_b2, or_vec_x, or_vec_y)
                if (in1 < 0 and in2 < 0 and in3 < 0 and in4 < 0) or (
                        in1 > 0 and in2 > 0 and in3 > 0 and in4 > 0):
                    continue
                for p_b in zip(poly_b.x_points, poly_b.y_points):
                    if abs(get_in_dist(p_a, p_b, or_vec_x, or_vec_y)) <= 2 * tick_dist:
                        dist = min(dist, abs(get_off_dist(p_a, p_b, or_vec_x, or_vec_y)))
        tols.append(dist if dist < max_d else 0)

    sum_tols, num_tols = 0.0, 0
    for tol in tols:
        if tol != 0:
            sum_tols += tol
            num_tols += 1
    mean_tols = max_d
    if num_tols:
        mean_tols = sum_tols / num_tols
    for i, tol in enumerate(tols):
        if tol == 0:
            tols[i] = mean_tols
        tols[i] = min(tols[i], mean_tols)
        tols[i] *= rel_tol
    return tols
