// Native geometry kernel — the java_util/Util.class replacement.
//
// Implements the hot pairwise baseline loops exactly as the reference's
// Python fallbacks define them (dbscan_baselines.py:63-110,
// geometry/util.py:831-902, eval_measure.py:65-258), including the
// order-dependent running-minimum bbox skip. Exposed through a C ABI and
// loaded via ctypes (citlab_as_tpu/geometry/native.py); results must be
// bit-identical to the numpy implementations (golden-tested).
//
// Entry points:
//   gk_norm_poly_dists     — blow_up + thin_out baseline normalization
//   gk_interline_distances — per-baseline min perpendicular distance
//   gk_calc_tols           — measure tolerance values per GT baseline
//   gk_calc_metric         — precision/recall matrices for the AS measure
//
// Build: make -C native   (produces native/libgeometry_kernel.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

struct Poly {
    std::vector<double> x;
    std::vector<double> y;
    double bb_x0 = 0, bb_y0 = 0, bb_x1 = 0, bb_y1 = 0;  // x, y, x+w, y+h

    void calc_bounds() {
        double minx = x[0], maxx = x[0], miny = y[0], maxy = y[0];
        for (size_t i = 1; i < x.size(); ++i) {
            minx = std::min(minx, x[i]);
            maxx = std::max(maxx, x[i]);
            miny = std::min(miny, y[i]);
            maxy = std::max(maxy, y[i]);
        }
        // width = max-min+1 convention (polygon.py calculate_bounds)
        bb_x0 = minx;
        bb_y0 = miny;
        bb_x1 = minx + (maxx - minx + 1);
        bb_y1 = miny + (maxy - miny + 1);
    }
};

// round_to_nearest_integer (rounding.py:20-31): x%1>=0.5 -> trunc(x)+1
inline long round_half_up(double v) {
    double frac = v - std::floor(v);  // Python x % 1 for divisor 1
    double base = std::trunc(v);
    return (long)(frac >= 0.5 ? base + 1 : base);
}

Poly blow_up(const Poly& p) {
    Poly res;
    size_t n = p.x.size();
    if (n < 2) { res = p; return res; }
    for (size_t i = 1; i < n; ++i) {
        double x1 = p.x[i - 1], y1 = p.y[i - 1];
        double x2 = p.x[i], y2 = p.y[i];
        long diff_x = (long)std::llabs((long long)(x2 - x1));
        long diff_y = (long)std::llabs((long long)(y2 - y1));
        if (std::max(diff_x, diff_y) < 1) {
            if (i == n - 1) { res.x.push_back(x2); res.y.push_back(y2); }
            continue;
        }
        res.x.push_back(x1);
        res.y.push_back(y1);
        if (diff_x >= diff_y) {
            for (long j = 1; j < diff_x; ++j) {
                double xn = x1 < x2 ? x1 + j : x1 - j;
                double yn = (double)round_half_up(y1 + (xn - x1) * (y2 - y1) / (x2 - x1));
                res.x.push_back(xn);
                res.y.push_back(yn);
            }
        } else {
            for (long j = 1; j < diff_y; ++j) {
                double yn = y1 < y2 ? y1 + j : y1 - j;
                double xn = (double)round_half_up(x1 + (yn - y1) * (x2 - x1) / (y2 - y1));
                res.x.push_back(xn);
                res.y.push_back(yn);
            }
        }
        if (i == n - 1) { res.x.push_back(x2); res.y.push_back(y2); }
    }
    return res;
}

Poly thin_out(const Poly& p, long des_dist) {
    if (p.x.size() <= 20) return p;
    Poly res;
    long dist = (long)p.x.size() - 1;
    long des_pts = std::max(20L, dist / des_dist + 1);
    double step = (double)dist / (double)(des_pts - 1);
    for (long i = 0; i < des_pts - 1; ++i) {
        long idx = (long)(i * step);
        res.x.push_back(p.x[idx]);
        res.y.push_back(p.y[idx]);
    }
    res.x.push_back(p.x.back());
    res.y.push_back(p.y.back());
    return res;
}

Poly norm_poly(const Poly& p, long des_dist) {
    // huge-bbox guard (polygon.py:256-259)
    double minx = p.x[0], maxx = p.x[0], miny = p.y[0], maxy = p.y[0];
    for (size_t i = 1; i < p.x.size(); ++i) {
        minx = std::min(minx, p.x[i]);
        maxx = std::max(maxx, p.x[i]);
        miny = std::min(miny, p.y[i]);
        maxy = std::max(maxy, p.y[i]);
    }
    Poly src = p;
    if (maxx - minx + 1 > 100000 || maxy - miny + 1 > 100000) {
        src.x = {0}; src.y = {0};
    }
    Poly out = thin_out(blow_up(src), des_dist);
    out.calc_bounds();
    return out;
}

// calc_reg_line_stats angle (polygon.py:271-319)
double reg_line_angle(const Poly& p) {
    size_t n = p.x.size();
    if (n <= 1) return 0.0;
    double m;
    bool inf_slope = false;
    if (n > 2) {
        double xmax = *std::max_element(p.x.begin(), p.x.end());
        double xmin = *std::min_element(p.x.begin(), p.x.end());
        if (xmax == xmin) {
            inf_slope = true;
            m = 0;
        } else if (xmax - xmin < 2) {
            inf_slope = true;  // calc_line's x-range guard
            m = 0;
        } else {
            // 2x2 normal equations on (x, -y)
            double s1 = (double)n, sx = 0, sxx = 0, sy = 0, sxy = 0;
            for (size_t i = 0; i < n; ++i) {
                double xi = p.x[i], yi = -p.y[i];
                sx += xi; sxx += xi * xi; sy += yi; sxy += xi * yi;
            }
            double det = s1 * sxx - sx * sx;
            if (det < 1e-9) {
                inf_slope = true;
                m = 0;
            } else {
                m = (s1 * sxy - sx * sy) / det;
            }
        }
    } else {
        double x1 = p.x[0], x2 = p.x[1];
        double y1 = -p.y[0], y2 = -p.y[1];
        if (x1 == x2) { inf_slope = true; m = 0; }
        else m = (y2 - y1) / (x2 - x1);
    }
    double angle = inf_slope ? M_PI / 2 : std::atan(m);
    if (angle > -M_PI / 2 && angle <= -M_PI / 4 && p.y.front() > p.y.back())
        angle += M_PI;
    if (angle > -M_PI / 4 && angle <= M_PI / 4 && p.x.front() > p.x.back())
        angle += M_PI;
    if (angle > M_PI / 4 && angle < M_PI / 2 && p.y.front() < p.y.back())
        angle += M_PI;
    if (angle < 0) angle += 2 * M_PI;
    return angle;
}

inline double dist_fast(double px, double py, const Poly& b) {
    double d = 0.0;
    if (px < b.bb_x0) d += b.bb_x0 - px;
    if (px > b.bb_x1) d += px - b.bb_x1;
    if (py < b.bb_y0) d += b.bb_y0 - py;
    if (py > b.bb_y1) d += py - b.bb_y1;
    return d;
}

inline double in_dist(double p1x, double p1y, double p2x, double p2y,
                      double ox, double oy) {
    return (p1x - p2x) * ox + (-p1y + p2y) * oy;
}

inline double off_dist(double p1x, double p1y, double p2x, double p2y,
                       double ox, double oy) {
    return (p1x - p2x) * oy - (-p1y + p2y) * ox;
}

// shared loop nest of interline distances / tolerance calc
std::vector<double> min_perp_dists(const std::vector<Poly>& polys,
                                   double tick, double max_d) {
    size_t n = polys.size();
    std::vector<double> out(n, max_d);
    for (size_t a = 0; a < n; ++a) {
        const Poly& pa = polys[a];
        double angle = reg_line_angle(pa);
        double ox = std::cos(angle), oy = std::sin(angle);
        double dist = max_d;
        double a1x = pa.x.front(), a1y = pa.y.front();
        double a2x = pa.x.back(), a2y = pa.y.back();
        for (size_t ai = 0; ai < pa.x.size(); ++ai) {
            double px = pa.x[ai], py = pa.y[ai];
            for (size_t b = 0; b < n; ++b) {
                if (b == a) continue;
                const Poly& pb = polys[b];
                if (dist_fast(px, py, pb) > dist) continue;  // running skip
                double b1x = pb.x.front(), b1y = pb.y.front();
                double b2x = pb.x.back(), b2y = pb.y.back();
                double d11 = in_dist(a1x, a1y, b1x, b1y, ox, oy);
                double d12 = in_dist(a1x, a1y, b2x, b2y, ox, oy);
                double d21 = in_dist(a2x, a2y, b1x, b1y, ox, oy);
                double d22 = in_dist(a2x, a2y, b2x, b2y, ox, oy);
                if ((d11 < 0 && d12 < 0 && d21 < 0 && d22 < 0) ||
                    (d11 > 0 && d12 > 0 && d21 > 0 && d22 > 0))
                    continue;
                for (size_t bi = 0; bi < pb.x.size(); ++bi) {
                    if (std::fabs(in_dist(px, py, pb.x[bi], pb.y[bi], ox, oy)) <= 2.0 * tick) {
                        double od = std::fabs(off_dist(px, py, pb.x[bi], pb.y[bi], ox, oy));
                        dist = std::min(dist, od);
                    }
                }
            }
        }
        out[a] = dist;
    }
    return out;
}

std::vector<Poly> unpack(const double* coords, const int32_t* offsets,
                         int32_t n_polys) {
    std::vector<Poly> polys(n_polys);
    for (int32_t i = 0; i < n_polys; ++i) {
        int32_t start = offsets[i], end = offsets[i + 1];
        polys[i].x.reserve(end - start);
        polys[i].y.reserve(end - start);
        for (int32_t j = start; j < end; ++j) {
            polys[i].x.push_back(coords[2 * j]);
            polys[i].y.push_back(coords[2 * j + 1]);
        }
        polys[i].calc_bounds();
    }
    return polys;
}

// soft hit count (eval_measure.py:126-175) for all tolerance ticks at once
void count_rel_hits(const Poly& to_count, const Poly& ref,
                    const double* tols, int32_t n_tols, double* out) {
    for (int32_t t = 0; t < n_tols; ++t) out[t] = 0.0;
    // bbox early stop against intersection extents (possibly negative)
    double ix0 = std::max(to_count.bb_x0, ref.bb_x0);
    double iy0 = std::max(to_count.bb_y0, ref.bb_y0);
    double ix1 = std::min(to_count.bb_x1, ref.bb_x1);
    double iy1 = std::min(to_count.bb_y1, ref.bb_y1);
    if (std::min(ix1 - ix0, iy1 - iy0) < -3.0 * tols[n_tols - 1]) return;

    size_t np = to_count.x.size();
    for (size_t i = 0; i < np; ++i) {
        double md = std::numeric_limits<double>::infinity();
        for (size_t j = 0; j < ref.x.size(); ++j) {
            double d = std::fabs(to_count.x[i] - ref.x[j])
                     + std::fabs(to_count.y[i] - ref.y[j]);
            md = std::min(md, d);
        }
        for (int32_t t = 0; t < n_tols; ++t) {
            double tol = tols[t];
            if (md <= tol) out[t] += 1.0;
            else if (md <= 3.0 * tol) out[t] += (3.0 * tol - md) / (2.0 * tol);
        }
    }
    for (int32_t t = 0; t < n_tols; ++t) out[t] /= (double)np;
}

void count_rel_hits_union(const Poly& to_count, const std::vector<Poly>& refs,
                          const double* tols, int32_t n_tols, double* out) {
    for (int32_t t = 0; t < n_tols; ++t) out[t] = 0.0;
    size_t np = to_count.x.size();
    std::vector<double> min_dist(np, std::numeric_limits<double>::infinity());
    bool any = false;
    for (const Poly& ref : refs) {
        double ix0 = std::max(to_count.bb_x0, ref.bb_x0);
        double iy0 = std::max(to_count.bb_y0, ref.bb_y0);
        double ix1 = std::min(to_count.bb_x1, ref.bb_x1);
        double iy1 = std::min(to_count.bb_y1, ref.bb_y1);
        if (std::min(ix1 - ix0, iy1 - iy0) < -3.0 * tols[n_tols - 1]) continue;
        any = true;
        for (size_t i = 0; i < np; ++i) {
            for (size_t j = 0; j < ref.x.size(); ++j) {
                double d = std::fabs(to_count.x[i] - ref.x[j])
                         + std::fabs(to_count.y[i] - ref.y[j]);
                min_dist[i] = std::min(min_dist[i], d);
            }
        }
    }
    if (!any) return;
    for (size_t i = 0; i < np; ++i) {
        for (int32_t t = 0; t < n_tols; ++t) {
            double tol = tols[t];
            if (min_dist[i] <= tol) out[t] += 1.0;
            else if (min_dist[i] <= 3.0 * tol) out[t] += (3.0 * tol - min_dist[i]) / (2.0 * tol);
        }
    }
    for (int32_t t = 0; t < n_tols; ++t) out[t] /= (double)np;
}

std::vector<double> calc_tols_inner(const std::vector<Poly>& normed,
                                    double tick, double max_d, double rel_tol) {
    std::vector<double> d = min_perp_dists(normed, tick, max_d);
    std::vector<double> tols(d.size());
    double sum = 0; int cnt = 0;
    for (size_t i = 0; i < d.size(); ++i) {
        tols[i] = d[i] < max_d ? d[i] : 0.0;
        if (tols[i] != 0) { sum += tols[i]; ++cnt; }
    }
    double mean = cnt ? sum / cnt : max_d;
    for (size_t i = 0; i < tols.size(); ++i) {
        if (tols[i] == 0) tols[i] = mean;
        tols[i] = std::min(tols[i], mean) * rel_tol;
    }
    return tols;
}

}  // namespace

extern "C" {

// coords: [total_points * 2] doubles (x, y interleaved, RAW polygons);
// offsets: [n_polys + 1] point offsets; out: [n_polys]
void gk_interline_distances(const double* coords, const int32_t* offsets,
                            int32_t n_polys, int32_t des_dist, double max_d,
                            double* out) {
    std::vector<Poly> raw = unpack(coords, offsets, n_polys);
    std::vector<Poly> normed(n_polys);
    for (int32_t i = 0; i < n_polys; ++i) normed[i] = norm_poly(raw[i], des_dist);
    std::vector<double> d = min_perp_dists(normed, des_dist, max_d);
    std::memcpy(out, d.data(), n_polys * sizeof(double));
}

// same, but polygons are already normed (matches the numpy-path contract)
void gk_interline_distances_normed(const double* coords, const int32_t* offsets,
                                   int32_t n_polys, int32_t des_dist,
                                   double max_d, double* out) {
    std::vector<Poly> normed = unpack(coords, offsets, n_polys);
    std::vector<double> d = min_perp_dists(normed, des_dist, max_d);
    std::memcpy(out, d.data(), n_polys * sizeof(double));
}

void gk_calc_tols(const double* coords, const int32_t* offsets,
                  int32_t n_polys, int32_t tick_dist, double max_d,
                  double rel_tol, double* out) {
    std::vector<Poly> normed = unpack(coords, offsets, n_polys);
    std::vector<double> tols = calc_tols_inner(normed, tick_dist, max_d, rel_tol);
    std::memcpy(out, tols.data(), n_polys * sizeof(double));
}

// AS measure page metric (java Util.calcMetricForPageBaseLinePolys analog):
// truth/reco given RAW; tols: n_tols tick values, tols[0] < 0 -> dynamic.
// out_precision: [n_tols * n_reco], out_recall: [n_tols * n_truth]
void gk_calc_metric(const double* t_coords, const int32_t* t_offsets, int32_t n_truth,
                    const double* r_coords, const int32_t* r_offsets, int32_t n_reco,
                    const double* tols_in, int32_t n_tols,
                    int32_t tick_dist, double rel_tol,
                    double* out_precision, double* out_recall) {
    std::vector<Poly> truth_raw = unpack(t_coords, t_offsets, n_truth);
    std::vector<Poly> reco_raw = unpack(r_coords, r_offsets, n_reco);
    std::vector<Poly> truth(n_truth), reco(n_reco);
    for (int32_t i = 0; i < n_truth; ++i) truth[i] = norm_poly(truth_raw[i], tick_dist);
    for (int32_t i = 0; i < n_reco; ++i) reco[i] = norm_poly(reco_raw[i], tick_dist);

    // per-truth-line tolerance vectors [n_truth][n_tols]
    std::vector<std::vector<double>> line_tols(n_truth, std::vector<double>(n_tols));
    if (n_tols > 0 && tols_in[0] < 0) {
        std::vector<double> dyn = calc_tols_inner(truth, tick_dist, 250.0, rel_tol);
        for (int32_t i = 0; i < n_truth; ++i)
            for (int32_t t = 0; t < n_tols; ++t) line_tols[i][t] = dyn[i];
    } else {
        for (int32_t i = 0; i < n_truth; ++i)
            for (int32_t t = 0; t < n_tols; ++t) line_tols[i][t] = tols_in[t];
    }

    // precision: greedy alignment over per-pair hit counts
    std::vector<double> hits((size_t)n_tols * n_reco * n_truth, 0.0);
    std::vector<double> tmp(n_tols);
    for (int32_t i = 0; i < n_reco; ++i) {
        for (int32_t j = 0; j < n_truth; ++j) {
            count_rel_hits(reco[i], truth[j], line_tols[j].data(), n_tols, tmp.data());
            for (int32_t t = 0; t < n_tols; ++t)
                hits[(size_t)t * n_reco * n_truth + (size_t)i * n_truth + j] = tmp[t];
        }
    }
    for (int32_t t = 0; t < n_tols; ++t) {
        double* h = &hits[(size_t)t * n_reco * n_truth];
        for (int32_t i = 0; i < n_reco; ++i) out_precision[(size_t)t * n_reco + i] = 0.0;
        while (true) {
            double best = -1.0;
            int32_t bi = 0, bj = 0;
            for (int32_t i = 0; i < n_reco; ++i)
                for (int32_t j = 0; j < n_truth; ++j) {
                    double v = h[(size_t)i * n_truth + j];
                    if (v > best) { best = v; bi = i; bj = j; }
                }
            if (best < 0) break;
            out_precision[(size_t)t * n_reco + bi] = best;
            for (int32_t j = 0; j < n_truth; ++j) h[(size_t)bi * n_truth + j] = -1.0;
            for (int32_t i = 0; i < n_reco; ++i) h[(size_t)i * n_truth + bj] = -1.0;
        }
    }

    // recall: union over reco polygons
    for (int32_t j = 0; j < n_truth; ++j) {
        count_rel_hits_union(truth[j], reco, line_tols[j].data(), n_tols, tmp.data());
        for (int32_t t = 0; t < n_tols; ++t)
            out_recall[(size_t)t * n_truth + j] = tmp[t];
    }
}

// 2-D Delaunay triangulation (sweep-circle, O(n log n)) — replaces scipy's
// qhull call in geometry/util.py:alpha_shape, where the per-call qhull
// overhead (~4 ms for the textregion stage's ~900-point article clouds,
// textregion_generation.py:131-193) dominated the host tail. Triangle SET
// equals any valid Delaunay triangulation (ties broken arbitrarily under
// cocircularity, same as qhull); callers that only consume the unpaired-
// edge boundary are insensitive to triangle order.
//
// Conventions: triangles CCW; hull is a CCW circular list with the
// interior on the left of (v -> next[v]); hull_tri[v] is the halfedge id
// of the directed boundary edge v -> next[v]; halfedge k of triangle t
// is edge (tri[3t+k] -> tri[3t+(k+1)%3]) and halfedges[] pairs reversed
// directed edges (-1 on the boundary).

}  // extern "C"

namespace {

struct Delaunator {
    const double* pts;  // interleaved x,y
    int32_t n;
    std::vector<int32_t> tri;        // 3 vertex ids per triangle
    std::vector<int32_t> half;       // paired halfedge or -1
    std::vector<int32_t> hull_prev, hull_next, hull_tri, hash;
    std::vector<int32_t> stack;
    int32_t hash_size = 0;
    double cx = 0, cy = 0;  // seed circumcenter (sweep origin)

    double x(int32_t i) const { return pts[2 * i]; }
    double y(int32_t i) const { return pts[2 * i + 1]; }

    // > 0 iff (a,b,c) is a counter-clockwise turn
    double orient(int32_t a, int32_t b, int32_t c) const {
        return (x(b) - x(a)) * (y(c) - y(a)) - (y(b) - y(a)) * (x(c) - x(a));
    }

    // p strictly inside the circumcircle of CCW triangle (a,b,c)
    bool in_circle(int32_t a, int32_t b, int32_t c, int32_t p) const {
        double dx = x(a) - x(p), dy = y(a) - y(p);
        double ex = x(b) - x(p), ey = y(b) - y(p);
        double fx = x(c) - x(p), fy = y(c) - y(p);
        double ap = dx * dx + dy * dy;
        double bp = ex * ex + ey * ey;
        double cp = fx * fx + fy * fy;
        return dx * (ey * cp - bp * fy) - dy * (ex * cp - bp * fx)
             + ap * (ex * fy - ey * fx) > 0.0;
    }

    // squared circumradius of (a, b, c); HUGE_VAL when collinear
    double circum_r2(int32_t a, int32_t b, int32_t c) const {
        double dx = x(b) - x(a), dy = y(b) - y(a);
        double ex = x(c) - x(a), ey = y(c) - y(a);
        double bl = dx * dx + dy * dy, cl = ex * ex + ey * ey;
        double det = dx * ey - dy * ex;
        if (det == 0.0) return std::numeric_limits<double>::infinity();
        double d = 0.5 / det;
        double ux = (ey * bl - dy * cl) * d, uy = (dx * cl - ex * bl) * d;
        return ux * ux + uy * uy;
    }

    // monotone pseudo-angle of (dx, dy) in [0, 1)
    static double pseudo_angle(double dx, double dy) {
        double p = dx / (std::fabs(dx) + std::fabs(dy));
        return (dy > 0 ? 3.0 - p : 1.0 + p) / 4.0;
    }

    int32_t hash_key(double px, double py) const {
        int64_t k = (int64_t)std::floor(pseudo_angle(px - cx, py - cy)
                                        * (double)hash_size);
        return (int32_t)(((k % hash_size) + hash_size) % hash_size);
    }

    void link(int32_t a, int32_t b) {
        half[a] = b;
        if (b != -1) half[b] = a;
    }

    // append CCW triangle (i0, i1, i2); edges pair with (a, b, c)
    int32_t add_triangle(int32_t i0, int32_t i1, int32_t i2,
                         int32_t a, int32_t b, int32_t c) {
        int32_t t = (int32_t)tri.size();
        tri.push_back(i0); tri.push_back(i1); tri.push_back(i2);
        half.push_back(-1); half.push_back(-1); half.push_back(-1);
        link(t, a); link(t + 1, b); link(t + 2, c);
        return t;
    }

    // restore the Delaunay condition around halfedge a by edge flips;
    // returns the halfedge that ends up holding the new boundary edge
    // adjacent to the freshly inserted point (see insertion sites)
    int32_t legalize(int32_t a) {
        stack.clear();
        int32_t ar = 0;
        while (true) {
            int32_t b = half[a];
            int32_t a0 = a - a % 3;
            ar = a0 + (a + 2) % 3;
            if (b == -1) {
                if (stack.empty()) break;
                a = stack.back(); stack.pop_back();
                continue;
            }
            int32_t b0 = b - b % 3;
            int32_t al = a0 + (a + 1) % 3;
            int32_t bl = b0 + (b + 2) % 3;
            int32_t p0 = tri[ar];   // third vertex of this triangle
            int32_t pr = tri[a];    // flipped edge: pr -> pl
            int32_t pl = tri[al];
            int32_t p1 = tri[bl];   // third vertex of the adjacent triangle
            if (in_circle(p0, pr, pl, p1)) {
                tri[a] = p1;
                tri[b] = p0;
                int32_t hbl = half[bl];
                int32_t har = half[ar];
                // a relocated boundary edge must keep hull_tri[] valid:
                // p1->pl moves from slot bl to a; p0->pr from ar to b
                if (hbl == -1 && hull_tri[p1] == bl) hull_tri[p1] = a;
                if (har == -1 && hull_tri[p0] == ar) hull_tri[p0] = b;
                link(a, hbl);
                link(b, har);
                link(ar, bl);
                stack.push_back(b0 + (b + 1) % 3);  // re-check pr -> p1
            } else {
                if (stack.empty()) break;
                a = stack.back(); stack.pop_back();
            }
        }
        return ar;
    }

    // returns triangle count, or -1 when no triangulation exists
    int32_t run() {
        if (n < 3) return -1;
        // seed: point nearest the bbox centre, its nearest neighbour, and
        // the third point minimizing the circumradius
        double minx = x(0), maxx = x(0), miny = y(0), maxy = y(0);
        for (int32_t i = 1; i < n; ++i) {
            minx = std::min(minx, x(i)); maxx = std::max(maxx, x(i));
            miny = std::min(miny, y(i)); maxy = std::max(maxy, y(i));
        }
        double bx = (minx + maxx) / 2, by = (miny + maxy) / 2;
        auto dist2 = [&](int32_t i, double qx, double qy) {
            double dx = x(i) - qx, dy = y(i) - qy;
            return dx * dx + dy * dy;
        };
        int32_t i0 = 0;
        for (int32_t i = 1; i < n; ++i)
            if (dist2(i, bx, by) < dist2(i0, bx, by)) i0 = i;
        int32_t i1 = -1;
        double best = std::numeric_limits<double>::infinity();
        for (int32_t i = 0; i < n; ++i) {
            if (i == i0) continue;
            double d = dist2(i, x(i0), y(i0));
            if (d > 0.0 && d < best) { best = d; i1 = i; }
        }
        if (i1 == -1) return -1;  // all points coincident
        int32_t i2 = -1;
        best = std::numeric_limits<double>::infinity();
        for (int32_t i = 0; i < n; ++i) {
            if (i == i0 || i == i1) continue;
            double r = circum_r2(i0, i1, i);
            if (r < best) { best = r; i2 = i; }
        }
        if (i2 == -1 || !std::isfinite(best)) return -1;  // collinear input
        if (orient(i0, i1, i2) < 0) std::swap(i1, i2);

        // sweep origin: seed circumcenter
        {
            double dx = x(i1) - x(i0), dy = y(i1) - y(i0);
            double ex = x(i2) - x(i0), ey = y(i2) - y(i0);
            double bl = dx * dx + dy * dy, cl = ex * ex + ey * ey;
            double d = 0.5 / (dx * ey - dy * ex);
            cx = x(i0) + (ey * bl - dy * cl) * d;
            cy = y(i0) + (dx * cl - ex * bl) * d;
        }
        std::vector<int32_t> ids(n);
        for (int32_t i = 0; i < n; ++i) ids[i] = i;
        std::vector<double> d2(n);
        for (int32_t i = 0; i < n; ++i) d2[i] = dist2(i, cx, cy);
        std::sort(ids.begin(), ids.end(),
                  [&](int32_t a, int32_t b) { return d2[a] < d2[b]; });

        hash_size = (int32_t)std::ceil(std::sqrt((double)n));
        hash.assign(hash_size, -1);
        hull_prev.assign(n, -1);
        hull_next.assign(n, -1);
        hull_tri.assign(n, -1);
        tri.reserve((size_t)6 * n);
        half.reserve((size_t)6 * n);

        int32_t hull_start = i0;
        hull_next[i0] = i1; hull_prev[i1] = i0;
        hull_next[i1] = i2; hull_prev[i2] = i1;
        hull_next[i2] = i0; hull_prev[i0] = i2;
        add_triangle(i0, i1, i2, -1, -1, -1);
        hull_tri[i0] = 0; hull_tri[i1] = 1; hull_tri[i2] = 2;
        hash[hash_key(x(i0), y(i0))] = i0;
        hash[hash_key(x(i1), y(i1))] = i1;
        hash[hash_key(x(i2), y(i2))] = i2;

        double xp = 0, yp = 0;
        for (int32_t k = 0; k < n; ++k) {
            int32_t i = ids[k];
            if (i == i0 || i == i1 || i == i2) continue;
            if (k > 0 && x(i) == xp && y(i) == yp) continue;  // duplicate
            xp = x(i); yp = y(i);

            // visible hull edge: hash bucket, then walk forward
            int32_t start = -1;
            int32_t key = hash_key(x(i), y(i));
            for (int32_t j = 0; j < hash_size; ++j) {
                start = hash[(key + j) % hash_size];
                if (start != -1 && start != hull_next[start]) break;
            }
            if (start == -1) return -1;
            start = hull_prev[start];
            int32_t e = start, q;
            while (q = hull_next[e],
                   !(orient(e, q, i) < 0)) {  // visible = strictly right
                e = q;
                if (e == start) { e = -1; break; }
            }
            if (e == -1) continue;  // coincides with the hull — skip

            int32_t t = add_triangle(e, i, hull_next[e], -1, -1, hull_tri[e]);
            hull_tri[i] = legalize(t + 2);
            hull_tri[e] = t;

            // walk forward, filling visible edges
            int32_t nn = hull_next[e];
            while (q = hull_next[nn], orient(nn, q, i) < 0) {
                t = add_triangle(nn, i, q, hull_tri[i], -1, hull_tri[nn]);
                hull_tri[i] = legalize(t + 2);
                hull_next[nn] = nn;  // detached
                nn = q;
            }
            // walk backward
            if (e == start) {
                while (q = hull_prev[e], orient(q, e, i) < 0) {
                    t = add_triangle(q, i, e, -1, hull_tri[e], hull_tri[q]);
                    legalize(t + 2);
                    hull_tri[q] = t;
                    hull_next[e] = e;  // detached
                    e = q;
                }
            }
            hull_start = e;
            hull_prev[i] = e; hull_next[e] = i;
            hull_prev[nn] = i; hull_next[i] = nn;
            hash[hash_key(x(i), y(i))] = i;
            hash[hash_key(x(e), y(e))] = e;
        }
        (void)hull_start;
        return (int32_t)(tri.size() / 3);
    }
};

}  // namespace

extern "C" {

// points: n interleaved (x, y) doubles; out_tris: caller-allocated space for
// 3 * (2n) int32 vertex ids. Returns the triangle count or -1 on degenerate
// input (n < 3, all points collinear/coincident).
int32_t gk_delaunay(const double* points, int32_t n, int32_t* out_tris) {
    Delaunator d;
    d.pts = points;
    d.n = n;
    int32_t nt = d.run();
    if (nt <= 0) return -1;
    std::memcpy(out_tris, d.tri.data(), sizeof(int32_t) * d.tri.size());
    return nt;
}

// Alpha shape (concave hull) of 2-D points — the native twin of
// geometry/util.py alpha_shape (reference util.py:568-697): sweep-circle
// Delaunay, keep triangles with circumradius < alpha, boundary = edges
// appearing exactly once among kept triangles in first-occurrence scan
// order, walked into one closed circle; on a degenerate boundary (several
// circles / vertex used != 2 times / empty) alpha escalates by 20% and the
// extraction restarts. Identical float64 circumradius math and scan order
// as the Python paths (parity-tested).
//
// out_idx: caller-allocated space for 6n int32 vertex ids. Returns the
// boundary vertex count (circle order, NOT closed), -1 on degenerate
// triangulation, -2 if 64 escalations did not converge (callers fall back).
int32_t gk_alpha_shape(const double* points, int32_t n, double alpha,
                       int32_t* out_idx) {
    Delaunator d;
    d.pts = points;
    d.n = n;
    int32_t nt = d.run();
    if (nt <= 0) return -1;
    const int32_t* tris = d.tri.data();

    std::vector<double> circum_r((size_t)nt);
    for (int32_t t = 0; t < nt; ++t) {
        int32_t i0 = tris[3 * t], i1 = tris[3 * t + 1], i2 = tris[3 * t + 2];
        double x0 = points[2 * i0], y0 = points[2 * i0 + 1];
        double x1 = points[2 * i1], y1 = points[2 * i1 + 1];
        double x2 = points[2 * i2], y2 = points[2 * i2 + 1];
        double a = std::sqrt((x0 - x1) * (x0 - x1) + (y0 - y1) * (y0 - y1));
        double b = std::sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2));
        double c = std::sqrt((x2 - x0) * (x2 - x0) + (y2 - y0) * (y2 - y0));
        double sp = (a + b + c) / 2.0;
        double area = std::sqrt(std::max(
            sp * (sp - a) * (sp - b) * (sp - c), 0.0));
        circum_r[t] = a * b * c / (4.0 * (area + 1e-8));
    }

    std::unordered_map<int64_t, int32_t> first;   // canon key -> order slot
    std::vector<std::pair<int32_t, int32_t>> first_dir;
    std::vector<int32_t> count;
    first.reserve((size_t)nt * 3);

    for (int esc = 0; esc < 64; ++esc) {
        first.clear();
        first_dir.clear();
        count.clear();
        for (int32_t t = 0; t < nt; ++t) {
            if (!(circum_r[t] < alpha)) continue;
            int32_t v[4] = {tris[3 * t], tris[3 * t + 1], tris[3 * t + 2],
                            tris[3 * t]};
            for (int e = 0; e < 3; ++e) {
                int32_t u = v[e], w2 = v[e + 1];
                int64_t key = (u < w2) ? (int64_t)u * n + w2
                                       : (int64_t)w2 * n + u;
                auto it = first.find(key);
                if (it == first.end()) {
                    first.emplace(key, (int32_t)first_dir.size());
                    first_dir.emplace_back(u, w2);
                    count.push_back(1);
                } else {
                    count[(size_t)it->second] += 1;
                }
            }
        }
        std::vector<std::pair<int32_t, int32_t>> edges;
        for (size_t i = 0; i < first_dir.size(); ++i)
            if (count[i] == 1) edges.push_back(first_dir[i]);

        bool bad = edges.empty();
        if (!bad) {
            // adjacency in edge scan order; every vertex must end at
            // degree exactly 2 (same escalation triggers as
            // util.py _order_boundary)
            std::unordered_map<int32_t, std::pair<int32_t, int32_t>> adj;
            std::unordered_map<int32_t, int32_t> deg;
            adj.reserve(edges.size() * 2);
            deg.reserve(edges.size() * 2);
            for (auto& e : edges) {
                int32_t d1 = deg[e.first]++;
                int32_t d2 = deg[e.second]++;
                if (d1 >= 2 || d2 >= 2) { bad = true; break; }
                (d1 == 0 ? adj[e.first].first : adj[e.first].second) = e.second;
                (d2 == 0 ? adj[e.second].first : adj[e.second].second) = e.first;
            }
            if (!bad)
                for (auto& kv : deg)
                    if (kv.second != 2) { bad = true; break; }
            if (!bad) {
                int32_t start = edges[0].first;
                int32_t prev = -1, cur = start;
                size_t m = 0;
                out_idx[m++] = start;
                for (;;) {
                    auto& a2 = adj[cur];
                    int32_t nxt = (a2.first != prev) ? a2.first : a2.second;
                    if (nxt == start) break;
                    out_idx[m++] = nxt;
                    prev = cur;
                    cur = nxt;
                    if (m > edges.size()) { bad = true; break; }
                }
                if (!bad && m == edges.size()) return (int32_t)m;
                bad = true;
            }
        }
        alpha += alpha * 0.2;
    }
    return -2;
}

// Separator-mask post-processing in run space — the host twin of the
// device chain stages/separator.py:_separator_masks_device (reference:
// separator_net_post_processor.py:33-97): 8-connected CC filter
// (>= min_size), horizontal/vertical openings, saturated subtract, noise
// opening. All inputs are {0, 255} masks, so every step is exact on
// row/column runs:
//   * opening with a 1-D kernel k keeps a run [s, e) iff its eroded run
//     [s>0 ? s+k/2 : 0, e<W ? e-(k-1-k/2) : W) is nonempty (erosion pads
//     +inf at the image border per cv2, so border-touching short runs
//     survive), and dilating back restores the original extent clipped to
//     the image;
//   * the subtract of two {0,255} masks is h &= ~v.
// ~3 ms/page vs ~26 ms/page for the device CC fixpoint — this moves the
// biggest slab of the wave pipeline's device floor onto the (otherwise
// idle) host.

static int32_t uf_find(std::vector<int32_t>& parent, int32_t i) {
    while (parent[i] != i) {
        parent[i] = parent[parent[i]];
        i = parent[i];
    }
    return i;
}

namespace seppost {

struct Run { int32_t s, e, id; };

// Shared run-space core. ``runs`` holds the foreground row runs in
// row-major order with ``row_offsets`` [h+1] indexing them; everything
// downstream of the CC size filter touches only run extents, never a
// dense intermediate — the old dense formulation's strided column pass
// (the vertical opening) alone cost more than this whole function.
//
// Exactness argument vs the dense chain (golden-tested):
//   * 1-D opening of a {0,255} line = per maximal run [s, e): erode to
//     [es, ee) with es = (s==0)?0:s+lead, ee = (e==len)?len:e-trail
//     (border cells pad +inf per cv2), and if nonempty dilate back to
//     [max(0,es-trail), min(len,ee+lead)). For two runs with gap g >= 1,
//     the dilated images keep gap exactly g (ds2-de1 = s2-e1), so opened
//     runs never merge and run order is preserved.
//   * the saturated subtract only clears columns where out_v is set, so
//     the noise opening's maximal input runs are exactly the candidate
//     h-run fragments between painted v columns.
static void post_from_runs(const std::vector<Run>& all_runs,
                           const std::vector<int32_t>& row_offsets,
                           std::vector<int32_t>& parent,
                           const std::vector<int64_t>& size,
                           int32_t h, int32_t w, int32_t min_size,
                           int32_t h_kernel, int32_t v_kernel,
                           int32_t noise_kernel,
                           uint8_t* out_h, uint8_t* out_v) {
    std::memset(out_h, 0, (size_t)h * w);
    std::memset(out_v, 0, (size_t)h * w);

    // --- vertical opening -> out_v: sweep rows, tracking per-column run
    // starts of the SURVIVOR coverage; a column's run ends where coverage
    // stops, and the opening formula paints its dilated extent. Work is
    // O(coverage-change columns), i.e. O(survivor px) worst case.
    int32_t v_lead = v_kernel / 2, v_trail = v_kernel - 1 - v_kernel / 2;
    std::vector<int32_t> start_y(w, -1);
    std::vector<std::pair<int32_t, int32_t>> prev_iv, cur_iv;
    auto end_col = [&](int32_t x, int32_t y_end) {
        int32_t s = start_y[x];
        start_y[x] = -1;
        int32_t es = (s == 0) ? 0 : s + v_lead;
        int32_t ee = (y_end == h) ? h : y_end - v_trail;
        if (es < ee) {
            int32_t ds = std::max(0, es - v_trail);
            int32_t de = std::min(h, ee + v_lead);
            uint8_t* p = out_v + (int64_t)ds * w + x;
            for (int32_t yy = ds; yy < de; ++yy, p += w) *p = 255;
        }
    };
    for (int32_t y = 0; y <= h; ++y) {
        cur_iv.clear();
        if (y < h) {
            for (int32_t ri = row_offsets[y]; ri < row_offsets[y + 1]; ++ri) {
                const Run& r = all_runs[ri];
                if (size[uf_find(parent, r.id)] >= min_size)
                    cur_iv.push_back({r.s, r.e});
            }
        }
        // boundary sweep over the two sorted disjoint interval lists:
        // between consecutive interval endpoints membership is constant,
        // so each segment is processed wholesale
        size_t pi = 0, ci = 0;
        int32_t x = 0;
        while (true) {
            while (pi < prev_iv.size() && prev_iv[pi].second <= x) ++pi;
            while (ci < cur_iv.size() && cur_iv[ci].second <= x) ++ci;
            if (pi >= prev_iv.size() && ci >= cur_iv.size()) break;
            bool in_p = pi < prev_iv.size() && prev_iv[pi].first <= x;
            bool in_c = ci < cur_iv.size() && cur_iv[ci].first <= x;
            int32_t nb = w;
            if (pi < prev_iv.size())
                nb = std::min(nb, in_p ? prev_iv[pi].second : prev_iv[pi].first);
            if (ci < cur_iv.size())
                nb = std::min(nb, in_c ? cur_iv[ci].second : cur_iv[ci].first);
            if (in_p && !in_c)
                for (int32_t xx = x; xx < nb; ++xx) end_col(xx, y);
            else if (in_c && !in_p)
                for (int32_t xx = x; xx < nb; ++xx) start_y[xx] = y;
            x = nb;
        }
        prev_iv.swap(cur_iv);
    }

    // --- horizontal opening + subtract + noise opening -> out_h, all in
    // run space: per survivor run, open along x; scan the candidate's
    // extent in the (already painted) out_v row to split it at v columns;
    // noise-open each fragment.
    int32_t h_lead = h_kernel / 2, h_trail = h_kernel - 1 - h_kernel / 2;
    int32_t n_lead = noise_kernel / 2, n_trail = noise_kernel - 1 - noise_kernel / 2;
    for (int32_t y = 0; y < h; ++y) {
        const uint8_t* vrow = out_v + (int64_t)y * w;
        uint8_t* hrow = out_h + (int64_t)y * w;
        for (int32_t ri = row_offsets[y]; ri < row_offsets[y + 1]; ++ri) {
            const Run& r = all_runs[ri];
            if (size[uf_find(parent, r.id)] < min_size) continue;
            int32_t es = (r.s == 0) ? 0 : r.s + h_lead;
            int32_t ee = (r.e == w) ? w : r.e - h_trail;
            if (es >= ee) continue;
            int32_t ds = std::max(0, es - h_trail);
            int32_t de = std::min(w, ee + h_lead);
            // fragments of [ds, de) where out_v is clear
            int32_t fx = ds;
            while (fx < de) {
                if (vrow[fx]) { ++fx; continue; }
                int32_t fs = fx;
                while (fx < de && !vrow[fx]) ++fx;
                int32_t fe = fx;   // fragment [fs, fe)
                int32_t es2 = (fs == 0) ? 0 : fs + n_lead;
                int32_t ee2 = (fe == w) ? w : fe - n_trail;
                if (es2 < ee2) {
                    int32_t ds2 = std::max(0, es2 - n_trail);
                    int32_t de2 = std::min(w, ee2 + n_lead);
                    std::memset(hrow + ds2, 255, de2 - ds2);
                }
            }
        }
    }
}

// 8-connected CC over row runs (union-find); merges run r with prev-row
// run p iff their column ranges touch after expanding r by one on both
// sides (ps <= e && pe >= s).
struct RunCC {
    std::vector<Run> all_runs;
    std::vector<int32_t> row_offsets;
    std::vector<int32_t> parent;
    std::vector<int64_t> size;
    std::vector<Run> prev, cur;

    void begin(int32_t h) {
        all_runs.reserve(1024);
        row_offsets.assign(1, 0);
        row_offsets.reserve(h + 1);
    }
    void add_run(int32_t s, int32_t e) {
        int32_t id = (int32_t)parent.size();
        parent.push_back(id);
        size.push_back(e - s);
        cur.push_back({s, e, id});
    }
    void end_row() {
        size_t pi = 0;
        for (const Run& r : cur) {
            while (pi < prev.size() && prev[pi].e < r.s) ++pi;
            for (size_t pj = pi; pj < prev.size() && prev[pj].s <= r.e; ++pj) {
                int32_t ra = uf_find(parent, r.id);
                int32_t rb = uf_find(parent, prev[pj].id);
                if (ra != rb) {
                    parent[rb] = ra;
                    size[ra] += size[rb];
                }
            }
        }
        for (const Run& r : cur) all_runs.push_back(r);
        row_offsets.push_back((int32_t)all_runs.size());
        prev.swap(cur);
        cur.clear();
    }
};

}  // namespace seppost

void gk_separator_post(const uint8_t* binary, int32_t h, int32_t w,
                       int32_t min_size, int32_t h_kernel, int32_t v_kernel,
                       int32_t noise_kernel, uint8_t* out_h, uint8_t* out_v) {
    seppost::RunCC cc;
    cc.begin(h);
    for (int32_t y = 0; y < h; ++y) {
        const uint8_t* row = binary + (int64_t)y * w;
        int32_t x = 0;
        while (x < w) {
            if (!row[x]) { ++x; continue; }
            int32_t s = x;
            while (x < w && row[x]) ++x;
            cc.add_run(s, x);
        }
        cc.end_row();
    }
    seppost::post_from_runs(cc.all_runs, cc.row_offsets, cc.parent, cc.size,
                            h, w, min_size, h_kernel, v_kernel, noise_kernel,
                            out_h, out_v);
}

// Row-major coordinates of the nonzero bytes of a [h, w] uint8 mask —
// numpy's np.nonzero spends ~3.5 ms on a 1500x1000 mask on this host
// (two generic passes); this single fused scan runs at memory bandwidth.
// ``cap`` guards the output buffers (callers size them via
// np.count_nonzero); returns the emit count, or -1 if cap was exceeded.
int64_t gk_nonzero_u8(const uint8_t* m, int32_t h, int32_t w,
                      int32_t* rows, int32_t* cols, int64_t cap) {
    int64_t k = 0;
    for (int32_t y = 0; y < h; ++y) {
        const uint8_t* row = m + (int64_t)y * w;
        int32_t x = 0;
        // skip zero bytes 8 at a time
        int32_t w8 = w & ~7;
        while (x < w8) {
            uint64_t wd;
            std::memcpy(&wd, row + x, 8);
            if (wd == 0) { x += 8; continue; }
            for (int32_t j = 0; j < 8; ++j, ++x) {
                if (row[x]) {
                    if (k >= cap) return -1;
                    rows[k] = y; cols[k] = x; ++k;
                }
            }
        }
        for (; x < w; ++x) {
            if (row[x]) {
                if (k >= cap) return -1;
                rows[k] = y; cols[k] = x; ++k;
            }
        }
    }
    return k;
}

// Packed-bits variant: ``packed`` is np.packbits(mask, axis=1) output —
// h rows of ``stride`` bytes, MSB-first within each byte (numpy default),
// bit x of row y at packed[y*stride + x/8] >> (7 - x%8). Lets the caller
// skip materializing the dense binary entirely (the device sends packed
// masks over the wire); zero bytes short-circuit 8 columns at a time.
void gk_separator_post_packed(const uint8_t* packed, int32_t h, int32_t w,
                              int32_t stride, int32_t min_size,
                              int32_t h_kernel, int32_t v_kernel,
                              int32_t noise_kernel,
                              uint8_t* out_h, uint8_t* out_v) {
    seppost::RunCC cc;
    cc.begin(h);
    for (int32_t y = 0; y < h; ++y) {
        const uint8_t* row = packed + (int64_t)y * stride;
        int32_t run_s = -1;
        for (int32_t bi = 0; bi < stride; ++bi) {
            uint8_t b = row[bi];
            int32_t base = bi * 8;
            if (b == 0x00) {
                if (run_s >= 0) { cc.add_run(run_s, std::min(base, w)); run_s = -1; }
                continue;
            }
            if (b == 0xFF) {
                if (run_s < 0) run_s = base;
                continue;
            }
            for (int32_t k = 0; k < 8; ++k) {
                int32_t x = base + k;
                bool set = (b >> (7 - k)) & 1;
                if (set && x < w) {
                    if (run_s < 0) run_s = x;
                } else if (run_s >= 0) {
                    cc.add_run(run_s, std::min(x, w));
                    run_s = -1;
                }
            }
        }
        if (run_s >= 0) cc.add_run(run_s, w);
        cc.end_row();
    }
    seppost::post_from_runs(cc.all_runs, cc.row_offsets, cc.parent, cc.size,
                            h, w, min_size, h_kernel, v_kernel, noise_kernel,
                            out_h, out_v);
}

// normalization utility: returns total output points; out buffers sized by
// caller via gk_norm_poly_sizes
void gk_norm_poly_dists(const double* coords, const int32_t* offsets,
                        int32_t n_polys, int32_t des_dist,
                        double* out_coords, int32_t* out_offsets) {
    int32_t pos = 0;
    out_offsets[0] = 0;
    std::vector<Poly> raw = unpack(coords, offsets, n_polys);
    for (int32_t i = 0; i < n_polys; ++i) {
        Poly np = norm_poly(raw[i], des_dist);
        for (size_t j = 0; j < np.x.size(); ++j) {
            out_coords[2 * pos] = np.x[j];
            out_coords[2 * pos + 1] = np.y[j];
            ++pos;
        }
        out_offsets[i + 1] = pos;
    }
}

int32_t gk_norm_poly_sizes(const double* coords, const int32_t* offsets,
                           int32_t n_polys, int32_t des_dist) {
    int32_t total = 0;
    std::vector<Poly> raw = unpack(coords, offsets, n_polys);
    for (int32_t i = 0; i < n_polys; ++i)
        total += (int32_t)norm_poly(raw[i], des_dist).x.size();
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Per-text-line SWT statistics over a uint8 distance-transform image.
//
// Host-native twin of the device per-line feature program
// (citlab_as_tpu/ops/swt_device.py) with the exact semantics of
// StrokeWidthDistanceTransform.textline_features (ops/swt.py:125-138,
// mirroring heading_net_post_processor.py:218-245 + swt_dist_trafo.py:31-66):
// for each line bbox (x, y, w, h) the INCLUSIVE crop dt[y:y+h+1, x:x+w+1]
// (numpy clip semantics) is 8-connected-component labeled; components are
// cleaned (w or h < 3 or > 500 at level>0; aspect ratio > 8 at level>1);
// stroke_width = median over kept components of the max DT value inside the
// component's BOUNDING BOX (neighbor pixels overlapping the bbox count —
// reference reads np.max over the bbox crop), text_height = max component
// height. Run-space union-find per crop: O(crop area) per line, ~1-3 ms for
// a full page's lines on this host vs ~46 ms/page for the device fixpoint
// program (whose v5e time is bound by the [L, 48, 512] propagation passes,
// not FLOPs).

namespace linestats {

struct Comp { int32_t minx, maxx, miny, maxy; };

}  // namespace linestats

extern "C" {

void gk_line_stats(const uint8_t* dt, int32_t H, int32_t W,
                   const int32_t* boxes, int32_t L, int32_t clean_ccs,
                   float* out /* L*2 (stroke_width, text_height) */) {
    std::vector<int32_t> parent;
    std::vector<linestats::Comp> comps;
    struct Run { int32_t s, e, id; };
    std::vector<Run> prev, cur;
    int32_t hist[256];

    for (int32_t i = 0; i < L; ++i) {
        const int32_t bx = boxes[4 * i], by = boxes[4 * i + 1];
        const int32_t bw = boxes[4 * i + 2], bh = boxes[4 * i + 3];
        out[2 * i] = 0.0f;
        out[2 * i + 1] = 0.0f;
        if (bw < 0 || bh < 0) continue;
        // numpy slice clip (bboxes are non-negative; negative x/y clamp to 0)
        const int32_t x0 = std::min(std::max(bx, 0), W);
        const int32_t y0 = std::min(std::max(by, 0), H);
        const int32_t x1 = std::max(x0, std::min(bx + bw + 1, W));
        const int32_t y1 = std::max(y0, std::min(by + bh + 1, H));
        const int32_t cw = x1 - x0, ch = y1 - y0;
        if (cw <= 0 || ch <= 0) continue;

        parent.clear();
        comps.clear();
        prev.clear();
        cur.clear();
        for (int32_t yy = 0; yy < ch; ++yy) {
            const uint8_t* row = dt + (int64_t)(y0 + yy) * W + x0;
            int32_t x = 0;
            while (x < cw) {
                if (!row[x]) { ++x; continue; }
                int32_t s = x;
                while (x < cw && row[x]) ++x;
                int32_t id = (int32_t)parent.size();
                parent.push_back(id);
                comps.push_back({s, x - 1, yy, yy});
                cur.push_back({s, x, id});
            }
            // merge with previous-row runs overlapping [s-1, e] (8-conn)
            size_t pi = 0;
            for (const Run& r : cur) {
                while (pi < prev.size() && prev[pi].e < r.s) ++pi;
                for (size_t pj = pi; pj < prev.size() && prev[pj].s <= r.e;
                     ++pj) {
                    int32_t ra = uf_find(parent, r.id);
                    int32_t rb = uf_find(parent, prev[pj].id);
                    if (ra == rb) continue;
                    parent[rb] = ra;
                    linestats::Comp& a = comps[ra];
                    const linestats::Comp& b = comps[rb];
                    a.minx = std::min(a.minx, b.minx);
                    a.maxx = std::max(a.maxx, b.maxx);
                    a.miny = std::min(a.miny, b.miny);
                    a.maxy = std::max(a.maxy, b.maxy);
                }
            }
            prev.swap(cur);
            cur.clear();
        }

        std::memset(hist, 0, sizeof(hist));
        int32_t k = 0, text_height = 0;
        for (int32_t id = 0; id < (int32_t)parent.size(); ++id) {
            if (parent[id] != id) continue;   // path-compressed roots only
            const linestats::Comp& c = comps[id];
            const int32_t ccw = c.maxx - c.minx + 1;
            const int32_t cch = c.maxy - c.miny + 1;
            if (clean_ccs > 0 && (ccw < 3 || cch < 3 || cch > 500 || ccw > 500))
                continue;
            if (clean_ccs > 1 && (ccw > 8 * cch || cch > 8 * ccw))
                continue;
            uint8_t mx = 0;   // max DT over the component's bbox crop
            for (int32_t yy = c.miny; yy <= c.maxy; ++yy) {
                const uint8_t* row = dt + (int64_t)(y0 + yy) * W + x0;
                for (int32_t xx = c.minx; xx <= c.maxx; ++xx)
                    mx = std::max(mx, row[xx]);
            }
            ++hist[mx];
            ++k;
            text_height = std::max(text_height, cch);
        }
        if (k > 0) {
            // np.median of the k per-component maxima: average of the two
            // middle order statistics (equal when k is odd)
            const int32_t m1 = (k - 1) / 2, m2 = k / 2;
            int32_t cum = 0, v1 = -1, v2 = -1;
            for (int32_t t = 0; t < 256; ++t) {
                cum += hist[t];
                if (v1 < 0 && cum > m1) v1 = t;
                if (v2 < 0 && cum > m2) { v2 = t; break; }
            }
            out[2 * i] = 0.5f * (float)(v1 + v2);
        }
        out[2 * i + 1] = (float)text_height;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused baseline-clustering feature pass.
//
// Everything DBSCANBaselines.__init__ derives from the raw baseline
// polygons in ONE call (stages/baseline_clustering.py:78-111, reference
// dbscan_baselines.py:113-177): (1) normalize + interline distances,
// (2) rescale so the average positive interline distance hits
// ``target_avg`` (float->int TRUNCATION as in get_list_of_scaled_polygons),
// (3) re-normalize + re-measure, (4) emit the final distances plus the
// normed bounding boxes (x, y, w, h; w/h in the max-min+1 convention of
// polygon.calculate_bounds) that the vectorized neighborhood rule consumes.
// Replaces three pack/unpack round trips and ~2N Polygon materializations
// per page (~7 ms/page of the host tail on the 1-core bench host).
// The positive average is accumulated left-to-right in f64, matching
// Python's sum() on the same values bit-for-bit.

extern "C" {

void gk_cluster_features(const double* coords, const int32_t* offsets,
                         int32_t n, int32_t des_dist, double max_d,
                         double target_avg,
                         double* out_d /* n */, double* out_bb /* n*4 */) {
    std::vector<Poly> raw = unpack(coords, offsets, n);
    std::vector<Poly> normed(n);
    for (int32_t i = 0; i < n; ++i) normed[i] = norm_poly(raw[i], des_dist);
    std::vector<double> d = min_perp_dists(normed, des_dist, max_d);

    double sum = 0.0;
    int64_t cnt = 0;
    for (double v : d)
        if (v > 0) { sum += v; ++cnt; }

    if (target_avg > 0 && cnt > 0) {
        const double fac = target_avg / (sum / (double)cnt);
        for (int32_t i = 0; i < n; ++i) {
            Poly& p = raw[i];
            for (size_t j = 0; j < p.x.size(); ++j) {
                p.x[j] = std::trunc(fac * p.x[j]);
                p.y[j] = std::trunc(fac * p.y[j]);
            }
            normed[i] = norm_poly(p, des_dist);
        }
        d = min_perp_dists(normed, des_dist, max_d);
    }
    std::memcpy(out_d, d.data(), n * sizeof(double));
    for (int32_t i = 0; i < n; ++i) {
        const Poly& p = normed[i];
        out_bb[4 * i + 0] = p.bb_x0;
        out_bb[4 * i + 1] = p.bb_y0;
        out_bb[4 * i + 2] = p.bb_x1 - p.bb_x0;
        out_bb[4 * i + 3] = p.bb_y1 - p.bb_y0;
    }
}

}  // extern "C"
