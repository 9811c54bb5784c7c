// Native host geometry for the video pipeline's per-frame postprocess:
// convex hull + rotating-calipers min-area rectangle, Moore-neighbor contour
// tracing, and RLE encoding.  These run on the host once per frame (SURVEY.md
// §7.4 analytics ops) while the TPU streams the next batch; C++ keeps them off
// the Python interpreter's critical path.
//
// C ABI (ctypes-friendly); no external dependencies.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Convex hull (Andrew monotone chain) + rotating calipers min-area rect.
// points: n*(x, y) float64.  out: [cx, cy, w, h, angle_deg].
// Returns 0 on success, <0 on degenerate input.
// ---------------------------------------------------------------------------
int min_area_rect(const double* pts, int64_t n, double* out) {
    if (n <= 0) return -1;
    std::vector<std::pair<double, double>> p(n);
    for (int64_t i = 0; i < n; ++i) p[i] = {pts[2 * i], pts[2 * i + 1]};
    std::sort(p.begin(), p.end());
    p.erase(std::unique(p.begin(), p.end()), p.end());
    const int64_t m = (int64_t)p.size();

    if (m == 1) {
        out[0] = p[0].first; out[1] = p[0].second;
        out[2] = out[3] = out[4] = 0.0;
        return 0;
    }
    if (m == 2) {
        double dx = p[1].first - p[0].first, dy = p[1].second - p[0].second;
        out[0] = (p[0].first + p[1].first) / 2;
        out[1] = (p[0].second + p[1].second) / 2;
        out[2] = std::hypot(dx, dy); out[3] = 0.0;
        out[4] = std::atan2(dy, dx) * 180.0 / M_PI;
        return 0;
    }

    auto cross = [](const std::pair<double, double>& o,
                    const std::pair<double, double>& a,
                    const std::pair<double, double>& b) {
        return (a.first - o.first) * (b.second - o.second) -
               (a.second - o.second) * (b.first - o.first);
    };
    std::vector<std::pair<double, double>> hull(2 * m);
    int64_t k = 0;
    for (int64_t i = 0; i < m; ++i) {
        while (k >= 2 && cross(hull[k - 2], hull[k - 1], p[i]) <= 0) --k;
        hull[k++] = p[i];
    }
    for (int64_t i = m - 2, t = k + 1; i >= 0; --i) {
        while (k >= (int64_t)t && cross(hull[k - 2], hull[k - 1], p[i]) <= 0) --k;
        hull[k++] = p[i];
    }
    hull.resize(k - 1);
    const int64_t h = (int64_t)hull.size();
    if (h < 3) {  // collinear
        double dx = hull[h - 1].first - hull[0].first;
        double dy = hull[h - 1].second - hull[0].second;
        out[0] = (hull[0].first + hull[h - 1].first) / 2;
        out[1] = (hull[0].second + hull[h - 1].second) / 2;
        out[2] = std::hypot(dx, dy); out[3] = 0.0;
        out[4] = std::atan2(dy, dx) * 180.0 / M_PI;
        return 0;
    }

    double best_area = 1e300, bw = 0, bh = 0, bang = 0, bcx = 0, bcy = 0;
    for (int64_t i = 0; i < h; ++i) {
        const int64_t j = (i + 1) % h;
        double ex = hull[j].first - hull[i].first;
        double ey = hull[j].second - hull[i].second;
        double len = std::hypot(ex, ey);
        if (len < 1e-12) continue;
        // normalize the candidate angle to [0, 90°) BEFORE computing extents,
        // matching the numpy fallback (geometry.py angles % (pi/2)) — so the
        // reported (w, h, angle) triple uses the same frame on every host
        double ang = std::atan2(ey, ex);
        ang = std::fmod(ang, M_PI / 2);
        if (ang < 0) ang += M_PI / 2;
        double ca = std::cos(ang), sa = std::sin(ang);  // rotate by -angle
        double minx = 1e300, maxx = -1e300, miny = 1e300, maxy = -1e300;
        for (int64_t q = 0; q < h; ++q) {
            double rx = hull[q].first * ca + hull[q].second * sa;
            double ry = -hull[q].first * sa + hull[q].second * ca;
            minx = std::min(minx, rx); maxx = std::max(maxx, rx);
            miny = std::min(miny, ry); maxy = std::max(maxy, ry);
        }
        double w = maxx - minx, hh = maxy - miny, area = w * hh;
        if (area < best_area) {
            best_area = area; bw = w; bh = hh;
            bang = ang * 180.0 / M_PI;
            double cxr = (minx + maxx) / 2, cyr = (miny + maxy) / 2;
            bcx = cxr * ca - cyr * sa;
            bcy = cxr * sa + cyr * ca;
        }
    }
    out[0] = bcx; out[1] = bcy; out[2] = bw; out[3] = bh; out[4] = bang;
    return 0;
}

// ---------------------------------------------------------------------------
// Largest outer contour via Moore-neighbor tracing on a binary mask.
// mask: h*w uint8 (0/1).  out_xy: caller buffer of max_pts*(x, y) int32.
// Returns number of points written (0 if empty), -1 on error, or -2 when the
// contour exceeds max_pts (caller must NOT use a truncated contour).
//
// Outer-vs-hole discrimination: a row-major scan's FIRST pixel of each
// 8-connected component is always on the component's OUTER boundary, so the
// trace starts only there; every other pixel of the component (including hole
// borders, which a naive "background to the left" test would match) is marked
// by a BFS component fill before the scan continues.
// ---------------------------------------------------------------------------
int64_t largest_contour(const uint8_t* mask, int64_t h, int64_t w,
                        int32_t* out_xy, int64_t max_pts) {
    std::vector<uint8_t> visited((size_t)h * w, 0);  // component-filled
    static const int dy8[8] = {0, 1, 1, 1, 0, -1, -1, -1};
    static const int dx8[8] = {1, 1, 0, -1, -1, -1, 0, 1};

    int64_t best_len = 0;
    std::vector<int32_t> best;
    std::vector<int32_t> cur;
    std::vector<int64_t> stack;

    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            const int64_t idx = y * w + x;
            if (!mask[idx] || visited[idx]) continue;
            // first scan-order pixel of a new component → on its outer border

            // Moore trace from (y, x), Jacob's stopping criterion: terminate
            // when the trace would LEAVE the start pixel in the same direction
            // as the initial move.  Stopping at the first mere return to the
            // start would truncate contours whose boundary passes through the
            // start pixel more than once (start pixel = cut vertex, e.g. a
            // thin spur attached at the topmost-leftmost pixel).
            cur.clear();
            int64_t cy = y, cx = x;
            int dir = 7;  // start search from NW-ish like classic tracing
            int first_dir = -1;
            cur.push_back((int32_t)cx); cur.push_back((int32_t)cy);
            const int64_t limit = 4 * h * w;
            for (int64_t steps = 0; steps < limit; ++steps) {
                bool found = false;
                int d = 0;
                int start = (dir + 6) % 8;  // backtrack then clockwise
                for (int t = 0; t < 8; ++t) {
                    d = (start + t) % 8;
                    int64_t ny = cy + dy8[d], nx = cx + dx8[d];
                    if (ny >= 0 && ny < h && nx >= 0 && nx < w &&
                        mask[ny * w + nx]) {
                        found = true;
                        break;
                    }
                }
                if (!found) break;  // isolated pixel
                if (cy == y && cx == x && d == first_dir) break;  // Jacob stop
                cy += dy8[d]; cx += dx8[d]; dir = d;
                if (first_dir < 0) first_dir = d;
                if (!(cy == y && cx == x)) {  // don't duplicate the start point
                    cur.push_back((int32_t)cx); cur.push_back((int32_t)cy);
                }
            }
            if ((int64_t)cur.size() / 2 > best_len) {
                best_len = (int64_t)cur.size() / 2;
                best = cur;
            }

            // BFS-fill the whole component so its interior/hole-border pixels
            // never start another trace
            stack.clear();
            stack.push_back(idx);
            visited[idx] = 1;
            while (!stack.empty()) {
                const int64_t p = stack.back();
                stack.pop_back();
                const int64_t py = p / w, px = p % w;
                for (int d = 0; d < 8; ++d) {
                    int64_t ny = py + dy8[d], nx = px + dx8[d];
                    if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
                        const int64_t q = ny * w + nx;
                        if (mask[q] && !visited[q]) {
                            visited[q] = 1;
                            stack.push_back(q);
                        }
                    }
                }
            }
        }
    }
    if (best_len == 0) return 0;
    if (best_len > max_pts) return -2;  // refuse to truncate silently
    std::memcpy(out_xy, best.data(), (size_t)best_len * 2 * sizeof(int32_t));
    return best_len;
}

// ---------------------------------------------------------------------------
// RLE encoding (mask_tools.rle_encoding semantics): 1-based start, run length.
// out: caller buffer of max_runs*2 int64.  Returns number of (start, len) pairs.
// ---------------------------------------------------------------------------
int64_t rle_encode(const uint8_t* mask, int64_t n, int64_t* out, int64_t max_runs) {
    int64_t count = 0;
    int64_t i = 0;
    while (i < n && count < max_runs) {
        while (i < n && !mask[i]) ++i;
        if (i >= n) break;
        int64_t start = i + 1;  // 1-based
        while (i < n && mask[i]) ++i;
        out[2 * count] = start;
        out[2 * count + 1] = i + 1 - start;
        ++count;
    }
    return count;
}

}  // extern "C"
