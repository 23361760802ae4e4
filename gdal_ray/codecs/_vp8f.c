/* VP8 in-loop deblocking filter — native twin of the per-macroblock
 * Python loop in vp8.py (_loop_filter, RFC 6386 §15). The filter
 * must run macroblock by macroblock in raster order (each edge reads
 * pixels the previous edges may have modified), so no numpy
 * formulation exists; the Python fallback spends most of a frame's
 * decode time in thousands of tiny 16-lane array ops. Semantics
 * transcribed 1:1 from the spec-derived Python; tests assert
 * native == Python on libwebp-encoded streams. Planes are the
 * signed-shifted int32 working copies (value - 128), unpadded,
 * mb_w*16 x mb_h*16 (luma) / mb_w*8 x mb_h*8 (chroma). Per-MB
 * filter levels (segment/delta logic applied, 0 = skip) and
 * skip-interior flags are precomputed by the caller.
 */
#include <stdint.h>
#include <stdlib.h>

static int c127(int x) { return x < -128 ? -128 : (x > 127 ? 127 : x); }
static int iabs(int x) { return x < 0 ? -x : x; }

/* §15.1 normal filter on one lane of a sub-block (interior) edge */
static void sb_lane(int32_t *p, long s, int limit, int interior,
                    int hev_t)
{
    int p3 = p[-4 * s], p2 = p[-3 * s], p1 = p[-2 * s], p0 = p[-s];
    int q0 = p[0], q1 = p[s], q2 = p[2 * s], q3 = p[3 * s];
    int m = (iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1)) <= limit
        && iabs(p3 - p2) <= interior && iabs(p2 - p1) <= interior
        && iabs(p1 - p0) <= interior && iabs(q1 - q0) <= interior
        && iabs(q2 - q1) <= interior && iabs(q3 - q2) <= interior;
    if (!m)
        return;
    {
        int hev = (iabs(p1 - p0) > hev_t) || (iabs(q1 - q0) > hev_t);
        int a = hev ? c127(c127(p1 - q1) + 3 * (q0 - p0))
                    : c127(3 * (q0 - p0));
        int a1 = c127(a + 4) >> 3;
        int a2 = c127(a + 3) >> 3;
        p[0] = c127(q0 - a1);
        p[-s] = c127(p0 + a2);
        if (!hev) {
            int a3 = c127(a1 + 1) >> 1;
            p[s] = c127(q1 - a3);
            p[-2 * s] = c127(p1 + a3);
        }
    }
}

/* §15.1 macroblock-edge filter on one lane */
static void mb_lane(int32_t *p, long s, int limit, int interior,
                    int hev_t)
{
    int p3 = p[-4 * s], p2 = p[-3 * s], p1 = p[-2 * s], p0 = p[-s];
    int q0 = p[0], q1 = p[s], q2 = p[2 * s], q3 = p[3 * s];
    int m = (iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1)) <= limit
        && iabs(p3 - p2) <= interior && iabs(p2 - p1) <= interior
        && iabs(p1 - p0) <= interior && iabs(q1 - q0) <= interior
        && iabs(q2 - q1) <= interior && iabs(q3 - q2) <= interior;
    if (!m)
        return;
    {
        int hev = (iabs(p1 - p0) > hev_t) || (iabs(q1 - q0) > hev_t);
        if (!hev) {
            int w = c127(c127(p1 - q1) + 3 * (q0 - p0));
            int a1 = (27 * w + 63) >> 7;
            int a2 = (18 * w + 63) >> 7;
            int a3 = (9 * w + 63) >> 7;
            p[0] = c127(q0 - a1);
            p[-s] = c127(p0 + a1);
            p[s] = c127(q1 - a2);
            p[-2 * s] = c127(p1 + a2);
            p[2 * s] = c127(q2 - a3);
            p[-3 * s] = c127(p2 + a3);
        } else {
            int a = c127(c127(p1 - q1) + 3 * (q0 - p0));
            int f1 = c127(a + 4) >> 3;
            int f2 = c127(a + 3) >> 3;
            p[0] = c127(q0 - f1);
            p[-s] = c127(p0 + f2);
        }
    }
}

/* §15.1 simple filter (p1 p0 | q0 q1) on one lane */
static void simple_lane(int32_t *p, long s, int limit)
{
    int p1 = p[-2 * s], p0 = p[-s], q0 = p[0], q1 = p[s];
    int m = (iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1)) <= limit;
    if (!m)
        return;
    {
        int a = c127(c127(p1 - q1) + 3 * (q0 - p0));
        int f1 = c127(a + 4) >> 3;
        int f2 = c127(a + 3) >> 3;
        p[0] = c127(q0 - f1);
        p[-s] = c127(p0 + f2);
    }
}

/* one edge of n lanes: base = first q0 pixel, lane = stride between
 * lanes, s = stride across the edge */
static void edge(int32_t *base, int n, long lane, long s, int kind,
                 int limit, int interior, int hev_t)
{
    int i;
    for (i = 0; i < n; i++) {
        int32_t *p = base + (long)i * lane;
        if (kind == 0)
            mb_lane(p, s, limit, interior, hev_t);
        else if (kind == 1)
            sb_lane(p, s, limit, interior, hev_t);
        else
            simple_lane(p, s, limit);
    }
}

int vp8_loop_filter(int32_t *Y, int32_t *U, int32_t *V,
                    int mb_w, int mb_h, int ftype, int sharpness,
                    const uint8_t *lvl, const uint8_t *skip)
{
    long ys = (long)mb_w * 16, cs = (long)mb_w * 8;
    int my, mx, k;
    for (my = 0; my < mb_h; my++) {
        for (mx = 0; mx < mb_w; mx++) {
            int L = lvl[my * mb_w + mx];
            int interior, hev_t, elmb, elsb, ss;
            long y0, x0, c0, cx0;
            if (L == 0)
                continue;
            interior = L;
            if (sharpness) {
                interior >>= (sharpness > 4) ? 2 : 1;
                if (interior > 9 - sharpness)
                    interior = 9 - sharpness;
            }
            if (interior < 1)
                interior = 1;
            hev_t = L >= 40 ? 2 : (L >= 15 ? 1 : 0);
            elmb = (L + 2) * 2 + interior;
            elsb = L * 2 + interior;
            ss = skip[my * mb_w + mx];
            y0 = (long)my * 16;
            x0 = (long)mx * 16;
            c0 = (long)my * 8;
            cx0 = (long)mx * 8;
            if (ftype == 1) {           /* simple: luma only */
                if (mx > 0)
                    edge(Y + y0 * ys + x0, 16, ys, 1, 2, elmb, 0, 0);
                if (!ss)
                    for (k = 4; k <= 12; k += 4)
                        edge(Y + y0 * ys + x0 + k, 16, ys, 1, 2,
                             elsb, 0, 0);
                if (my > 0)
                    edge(Y + y0 * ys + x0, 16, 1, ys, 2, elmb, 0, 0);
                if (!ss)
                    for (k = 4; k <= 12; k += 4)
                        edge(Y + (y0 + k) * ys + x0, 16, 1, ys, 2,
                             elsb, 0, 0);
                continue;
            }
            if (mx > 0) {
                edge(Y + y0 * ys + x0, 16, ys, 1, 0, elmb, interior,
                     hev_t);
                edge(U + c0 * cs + cx0, 8, cs, 1, 0, elmb, interior,
                     hev_t);
                edge(V + c0 * cs + cx0, 8, cs, 1, 0, elmb, interior,
                     hev_t);
            }
            if (!ss) {
                for (k = 4; k <= 12; k += 4)
                    edge(Y + y0 * ys + x0 + k, 16, ys, 1, 1, elsb,
                         interior, hev_t);
                edge(U + c0 * cs + cx0 + 4, 8, cs, 1, 1, elsb,
                     interior, hev_t);
                edge(V + c0 * cs + cx0 + 4, 8, cs, 1, 1, elsb,
                     interior, hev_t);
            }
            if (my > 0) {
                edge(Y + y0 * ys + x0, 16, 1, ys, 0, elmb, interior,
                     hev_t);
                edge(U + c0 * cs + cx0, 8, 1, cs, 0, elmb, interior,
                     hev_t);
                edge(V + c0 * cs + cx0, 8, 1, cs, 0, elmb, interior,
                     hev_t);
            }
            if (!ss) {
                for (k = 4; k <= 12; k += 4)
                    edge(Y + (y0 + k) * ys + x0, 16, 1, ys, 1, elsb,
                         interior, hev_t);
                edge(U + (c0 + 4) * cs + cx0, 8, 1, cs, 1, elsb,
                     interior, hev_t);
                edge(V + (c0 + 4) * cs + cx0, 8, 1, cs, 1, elsb,
                     interior, hev_t);
            }
        }
    }
    return 0;
}
