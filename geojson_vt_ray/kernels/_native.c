/* Native hot-loop kernels for the tile slicer.
 *
 * Exact C ports of the Python scalar kernels (which are themselves 1:1
 * semantic ports of the reference geojson-vt JS):
 *
 *   gvt_clip_line  <-> kernels/clip.py:_clip_line_scalar
 *                      (reference /root/reference/src/clip.js:98-170)
 *   gvt_thin       <-> kernels/tile.py:_thin_line + _rewind
 *                      (reference /root/reference/src/tile.js:85-123)
 *
 * Bit-exactness contract: compiled with -O2 -ffp-contract=off and no
 * -ffast-math, every float64 operation here runs in the same order as
 * the Python scalar path, so outputs are bit-identical (the golden
 * conformance suite and tests/test_native_parity.py pin this).
 * gvt_thin's shoelace area uses sequential summation like the
 * reference JS — the Python fallback's _rewind matches via cumsum.
 */

#include <math.h>
#include <stdint.h>

/* Clip one vertex run v (n rows of [x, y, sqdist], C-contiguous) to the
 * slab k1 <= coord[axis] <= k2.
 *
 * out      : capacity >= (2*n + 2) * 3 doubles; slices are contiguous.
 * bounds   : capacity >= n + 2 int64; bounds[s] = END offset (in points)
 *            of slice s (slice s spans [bounds[s-1] or 0, bounds[s])).
 * starts   : capacity >= n + 1 doubles; per-slice lineMetrics start.
 * ends     : capacity >= n + 1 doubles; per-slice lineMetrics end.
 *
 * Returns the number of slices (0 when everything is clipped away).
 */
int64_t gvt_clip_line(const double *v, int64_t n, double k1, double k2,
                      int32_t axis, int32_t is_polygon, int32_t track_metrics,
                      double line_start, double line_end,
                      double *out, int64_t *bounds,
                      double *starts, double *ends)
{
    if (n == 0)
        return 0;

    int64_t np_out = 0;      /* points emitted so far (all slices)       */
    int64_t nsl = 0;         /* slices closed so far                     */
    int64_t slice_begin = 0; /* first point of the open slice            */
    double sl_start = line_start;
    double sl_end = line_end;
    double length = line_start;
    double seg_len = 0.0;
    double t = 0.0;
    int64_t i;

    for (i = 0; i + 1 < n; i++) {
        double ax = v[3 * i];
        double ay = v[3 * i + 1];
        double az = v[3 * i + 2];
        double bx = v[3 * (i + 1)];
        double by = v[3 * (i + 1) + 1];
        double a = (axis == 0) ? ax : ay;
        double b = (axis == 0) ? bx : by;
        int exited = 0;

        if (track_metrics)
            seg_len = sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by));

        if (a < k1) {
            if (b > k1) { /* enters from the left */
                t = (k1 - a) / (b - a);
                if (axis == 0) {
                    out[3 * np_out] = k1;
                    out[3 * np_out + 1] = ay + (by - ay) * t;
                } else {
                    out[3 * np_out] = ax + (bx - ax) * t;
                    out[3 * np_out + 1] = k1;
                }
                out[3 * np_out + 2] = 1.0;
                np_out++;
                if (track_metrics)
                    sl_start = length + seg_len * t;
            }
        } else if (a > k2) {
            if (b < k2) { /* enters from the right */
                t = (k2 - a) / (b - a);
                if (axis == 0) {
                    out[3 * np_out] = k2;
                    out[3 * np_out + 1] = ay + (by - ay) * t;
                } else {
                    out[3 * np_out] = ax + (bx - ax) * t;
                    out[3 * np_out + 1] = k2;
                }
                out[3 * np_out + 2] = 1.0;
                np_out++;
                if (track_metrics)
                    sl_start = length + seg_len * t;
            }
        } else {
            out[3 * np_out] = ax;
            out[3 * np_out + 1] = ay;
            out[3 * np_out + 2] = az;
            np_out++;
        }
        if (b < k1 && a >= k1) { /* exits to the left */
            t = (k1 - a) / (b - a);
            if (axis == 0) {
                out[3 * np_out] = k1;
                out[3 * np_out + 1] = ay + (by - ay) * t;
            } else {
                out[3 * np_out] = ax + (bx - ax) * t;
                out[3 * np_out + 1] = k1;
            }
            out[3 * np_out + 2] = 1.0;
            np_out++;
            exited = 1;
        }
        if (b > k2 && a <= k2) { /* exits to the right */
            t = (k2 - a) / (b - a);
            if (axis == 0) {
                out[3 * np_out] = k2;
                out[3 * np_out + 1] = ay + (by - ay) * t;
            } else {
                out[3 * np_out] = ax + (bx - ax) * t;
                out[3 * np_out + 1] = k2;
            }
            out[3 * np_out + 2] = 1.0;
            np_out++;
            exited = 1;
        }

        if (!is_polygon && exited) {
            bounds[nsl] = np_out;
            starts[nsl] = sl_start;
            ends[nsl] = track_metrics ? (length + seg_len * t) : line_end;
            nsl++;
            slice_begin = np_out;
            sl_start = line_start;
            sl_end = line_end;
        }

        if (track_metrics)
            length += seg_len;
    }

    /* last point */
    {
        double ax = v[3 * (n - 1)];
        double ay = v[3 * (n - 1) + 1];
        double a = (axis == 0) ? ax : ay;
        if (a >= k1 && a <= k2) {
            out[3 * np_out] = ax;
            out[3 * np_out + 1] = ay;
            out[3 * np_out + 2] = v[3 * (n - 1) + 2];
            np_out++;
        }
    }

    /* close the polygon if clipping separated its endpoints */
    if (is_polygon && (np_out - slice_begin) >= 2 &&
        (out[3 * slice_begin] != out[3 * (np_out - 1)] ||
         out[3 * slice_begin + 1] != out[3 * (np_out - 1) + 1])) {
        out[3 * np_out] = out[3 * slice_begin];
        out[3 * np_out + 1] = out[3 * slice_begin + 1];
        out[3 * np_out + 2] = out[3 * slice_begin + 2];
        np_out++;
    }

    if (np_out > slice_begin) {
        bounds[nsl] = np_out;
        starts[nsl] = sl_start;
        ends[nsl] = sl_end;
        nsl++;
    }
    return nsl;
}

/* Fold one vertex run's x/y extents into bb = [minx, miny, maxx, maxy]
 * (in/out).  Replaces four numpy reductions per ring in
 * geom._bbox_lines — rings average 10-50 points, where numpy's
 * per-reduction dispatch costs more than the whole scan. */
void gvt_bbox(const double *v, int64_t n, double *bb)
{
    double minx = bb[0], miny = bb[1], maxx = bb[2], maxy = bb[3];
    int64_t i;
    for (i = 0; i < n; i++) {
        double x = v[3 * i];
        double y = v[3 * i + 1];
        if (x < minx) minx = x;
        if (x > maxx) maxx = x;
        if (y < miny) miny = y;
        if (y > maxy) maxy = y;
    }
    bb[0] = minx; bb[1] = miny; bb[2] = maxx; bb[3] = maxy;
}

/* Douglas-Peucker MARKING pass: write each chosen pivot's max squared
 * segment distance into v[3i+2], in place.  Exact C port of
 * simplify.py:simplify_mark's scalar branch (itself the 1:1 port of
 * reference src/simplify.js:4-39 including the flat-offset midpoint
 * tie-break of issue #104); run for every span, since the C scalar
 * loop beats the vectorized numpy path at all sizes.
 *
 * stack    : scratch, capacity >= 2 * n int64 (pairs pushed flat).
 */
void gvt_simplify(double *v, int64_t n, double sq_tolerance, int64_t *stack)
{
    int64_t sp = 0;
    if (n < 3)
        return;
    stack[sp++] = 0;
    stack[sp++] = n - 1;
    while (sp > 0) {
        int64_t last = stack[--sp];
        int64_t first = stack[--sp];
        int64_t span = last - first;
        if (span < 2)
            continue;

        double ax = v[3 * first];
        double ay = v[3 * first + 1];
        double bx = v[3 * last];
        double by = v[3 * last + 1];
        double dx0 = bx - ax;
        double dy0 = by - ay;
        double denom = dx0 * dx0 + dy0 * dy0;
        double maxd = sq_tolerance;
        int64_t mid3 = 3 * first + ((3 * span) >> 1);
        int64_t minpos = 3 * span;
        int64_t pivot = -1;
        int64_t i;

        for (i = first + 1; i < last; i++) {
            double px = v[3 * i];
            double py = v[3 * i + 1];
            double cx = ax;
            double cy = ay;
            double ex, ey, d;
            if (denom != 0.0) {
                double t = ((px - ax) * dx0 + (py - ay) * dy0) / denom;
                if (t > 1.0) {
                    cx = bx;
                    cy = by;
                } else if (t > 0.0) {
                    cx = ax + dx0 * t;
                    cy = ay + dy0 * t;
                }
            }
            ex = px - cx;
            ey = py - cy;
            d = ex * ex + ey * ey;
            if (d > maxd) {
                pivot = i;
                maxd = d;
            } else if (d == maxd) {
                int64_t pos = 3 * i - mid3;
                if (pos < 0)
                    pos = -pos;
                if (pos < minpos) {
                    pivot = i;
                    minpos = pos;
                }
            }
        }

        if (maxd > sq_tolerance && pivot >= 0) {
            v[3 * pivot + 2] = maxd;
            /* push right first so the left interval pops first,
             * matching the reference's in-order recursion */
            if (last - pivot > 1) {
                stack[sp++] = pivot;
                stack[sp++] = last;
            }
            if (pivot - first > 1) {
                stack[sp++] = first;
                stack[sp++] = pivot;
            }
        }
    }
}

/* Thin one ring/line by sqdist and (for polygon rings) enforce winding.
 *
 * v        : n rows of [x, y, sqdist], C-contiguous.
 * keep_all : tolerance == 0 fast path — keep every vertex.
 * out      : capacity >= n * 2 doubles (kept [x, y] pairs).
 *
 * Returns the kept count k.  Winding (tile.js:108-123): outer rings
 * clockwise in tile space, inner rings CCW; reversal done in out.
 */
int64_t gvt_thin(const double *v, int64_t n, double sq_tolerance,
                 int32_t keep_all, int32_t is_polygon, int32_t clockwise,
                 double *out)
{
    int64_t k = 0;
    int64_t i;

    if (keep_all) {
        for (i = 0; i < n; i++) {
            out[2 * i] = v[3 * i];
            out[2 * i + 1] = v[3 * i + 1];
        }
        k = n;
    } else {
        for (i = 0; i < n; i++) {
            if (v[3 * i + 2] > sq_tolerance) {
                out[2 * k] = v[3 * i];
                out[2 * k + 1] = v[3 * i + 1];
                k++;
            }
        }
    }

    if (is_polygon && k > 0) {
        double area = 0.0;
        for (i = 0; i + 1 < k; i++)
            area += (out[2 * (i + 1)] - out[2 * i]) *
                    (out[2 * (i + 1) + 1] + out[2 * i + 1]);
        area += (out[0] - out[2 * (k - 1)]) * (out[1] + out[2 * (k - 1) + 1]);
        if ((area > 0.0) == (clockwise != 0)) {
            for (i = 0; i < k / 2; i++) {
                double tx = out[2 * i];
                double ty = out[2 * i + 1];
                out[2 * i] = out[2 * (k - 1 - i)];
                out[2 * i + 1] = out[2 * (k - 1 - i) + 1];
                out[2 * (k - 1 - i)] = tx;
                out[2 * (k - 1 - i) + 1] = ty;
            }
        }
    }
    return k;
}
