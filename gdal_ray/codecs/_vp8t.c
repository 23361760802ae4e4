/* VP8 residual decode — native twin of vp8.py's per-macroblock
 * coefficient loop (§13 token decode via the §7.3 boolean decoder,
 * dequantization, §14.3 inverse WHT, §14.4 inverse DCT). The token
 * stream is strictly sequential (every bool decision updates the
 * range coder), so no numpy formulation exists. One call decodes ALL
 * coefficient blocks of one macroblock (Y2 + 16 Y + 4 U + 4 V),
 * maintains the above/left nonzero contexts, and returns the 24
 * spatial residual sub-blocks. Semantics transcribed 1:1 from the
 * Python; tests assert native == Python (byte-exact frames).
 */
#include <stdint.h>

static const int COEFF_TREE[22] = {
    -11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16,
    -5, -6, 18, 20, -7, -8, -9, -10};
static const int COEFF_BANDS[16] = {0, 1, 2, 3, 6, 4, 5, 6,
                                    6, 6, 6, 6, 6, 6, 6, 7};
static const int ZIGZAG[16] = {0, 1, 4, 8, 5, 2, 3, 6,
                               9, 12, 13, 10, 7, 11, 14, 15};
static const int CAT_BASE[6] = {5, 7, 11, 19, 35, 67};
static const int CAT_LEN[6] = {1, 2, 3, 4, 5, 11};
static const uint8_t CAT_PROBS[6][11] = {
    {159},
    {165, 145},
    {173, 148, 140},
    {176, 155, 140, 135},
    {180, 157, 141, 134, 130},
    {254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129}};

typedef struct {
    const uint8_t *data;
    long dlen;
    long pos;
    int rng;
    unsigned int value;
    int bit_count;
} BD;

static int bd_get(BD *b, int prob)
{
    int split = 1 + (((b->rng - 1) * prob) >> 8);
    unsigned int big = (unsigned int)split << 8;
    int ret;
    if (b->value >= big) {
        ret = 1;
        b->rng -= split;
        b->value -= big;
    } else {
        ret = 0;
        b->rng = split;
    }
    while (b->rng < 128) {
        b->value <<= 1;
        b->rng <<= 1;
        if (++b->bit_count == 8) {
            b->bit_count = 0;
            b->value |= (b->pos < b->dlen) ? b->data[b->pos] : 0;
            b->pos++;
        }
    }
    return ret;
}

/* decode one 4x4 block's tokens into zigzag-ordered dequantized
 * coefficients; returns the nonzero flag */
static int block_tokens(BD *bd, const uint8_t *probs /* 8*3*11 */,
                        int ctx, int first, int qdc, int qac,
                        int32_t out[16])
{
    int n, nonzero = 0, prev_zero = 0, i;
    for (i = 0; i < 16; i++)
        out[i] = 0;
    for (n = first; n < 16;) {
        const uint8_t *p = probs + (COEFF_BANDS[n] * 3 + ctx) * 11;
        int t = prev_zero ? 2 : 0;
        int tok, val;
        for (;;) {
            t = COEFF_TREE[t + bd_get(bd, p[t >> 1])];
            if (t <= 0) {
                tok = -t;
                break;
            }
        }
        if (tok == 11)                  /* EOB */
            break;
        if (tok == 0) {
            ctx = 0;
            prev_zero = 1;
            n++;
            continue;
        }
        prev_zero = 0;
        if (tok <= 4) {
            val = tok;
        } else {
            int cat = tok - 5, extra = 0, k;
            for (k = 0; k < CAT_LEN[cat]; k++)
                extra = (extra << 1) | bd_get(bd, CAT_PROBS[cat][k]);
            val = CAT_BASE[cat] + extra;
        }
        ctx = (val == 1) ? 1 : 2;
        if (bd_get(bd, 128))
            val = -val;
        out[ZIGZAG[n]] = val * (n == 0 ? qdc : qac);
        nonzero = 1;
        n++;
    }
    return nonzero;
}

static void iwht4x4(const int32_t in[16], int32_t dc[16])
{
    long tmp[16];
    int i;
    for (i = 0; i < 4; i++) {
        long a1 = (long)in[i] + in[i + 12];
        long b1 = (long)in[i + 4] + in[i + 8];
        long c1 = (long)in[i + 4] - in[i + 8];
        long d1 = (long)in[i] - in[i + 12];
        tmp[i] = a1 + b1;
        tmp[i + 4] = c1 + d1;
        tmp[i + 8] = a1 - b1;
        tmp[i + 12] = d1 - c1;
    }
    for (i = 0; i < 4; i++) {
        long a1 = tmp[i * 4] + 3;
        long a2 = a1 + tmp[i * 4 + 3];
        long b2 = (long)tmp[i * 4 + 1] + tmp[i * 4 + 2];
        long c2 = (long)tmp[i * 4 + 1] - tmp[i * 4 + 2];
        long d2 = a1 - tmp[i * 4 + 3];
        dc[i * 4] = (int32_t)((a2 + b2) >> 3);
        dc[i * 4 + 1] = (int32_t)((d2 + c2) >> 3);
        dc[i * 4 + 2] = (int32_t)((a2 - b2) >> 3);
        dc[i * 4 + 3] = (int32_t)((d2 - c2) >> 3);
    }
}

static void idct4x4(const int32_t ip[16], int32_t *out /* 16 */)
{
    const long c1 = 20091, c2 = 35468;
    long tmp[16];
    int i;
    for (i = 0; i < 4; i++) {
        long a1 = (long)ip[i] + ip[i + 8];
        long b1 = (long)ip[i] - ip[i + 8];
        long t1 = ((long)ip[i + 4] * c2) >> 16;
        long t2 = (long)ip[i + 12] + (((long)ip[i + 12] * c1) >> 16);
        long cc = t1 - t2;
        long dd;
        t1 = (long)ip[i + 4] + (((long)ip[i + 4] * c1) >> 16);
        t2 = ((long)ip[i + 12] * c2) >> 16;
        dd = t1 + t2;
        tmp[i] = a1 + dd;
        tmp[i + 12] = a1 - dd;
        tmp[i + 4] = b1 + cc;
        tmp[i + 8] = b1 - cc;
    }
    for (i = 0; i < 4; i++) {
        long *r = tmp + i * 4;
        long a1 = r[0] + r[2];
        long b1 = r[0] - r[2];
        long t1 = (r[1] * c2) >> 16;
        long t2 = r[3] + ((r[3] * c1) >> 16);
        long cc = t1 - t2;
        long dd;
        t1 = r[1] + ((r[1] * c1) >> 16);
        t2 = (r[3] * c2) >> 16;
        dd = t1 + t2;
        out[i * 4 + 0] = (int32_t)((a1 + dd + 4) >> 3);
        out[i * 4 + 3] = (int32_t)((a1 - dd + 4) >> 3);
        out[i * 4 + 1] = (int32_t)((b1 + cc + 4) >> 3);
        out[i * 4 + 2] = (int32_t)((b1 - cc + 4) >> 3);
    }
}

/* st = [pos, rng, value, bit_count]; probs = [4][8][3][11];
 * res = 24 blocks x 16 spatial residuals (Y 0-15, U 16-19, V 20-23);
 * nz = 25 ints: per-block AC-context nonzero flags + [24] = any_nz */
int vp8_mb_coeffs(const uint8_t *data, long dlen, int64_t *st,
                  const uint8_t *probs, int mb_has_y2, int skip,
                  int y1dc, int y1ac, int y2dc, int y2ac,
                  int uvdc, int uvac,
                  int32_t *above_y, int32_t *left_y,
                  int32_t *above_u, int32_t *left_u,
                  int32_t *above_v, int32_t *left_v,
                  int32_t *above_y2, int32_t *left_y2,
                  int32_t *res, int32_t *nz)
{
    BD bd;
    int32_t co[16], dcs[16];
    int have_dcs = 0, any_nz = 0;
    int b, i;
    bd.data = data;
    bd.dlen = dlen;
    bd.pos = st[0];
    bd.rng = (int)st[1];
    bd.value = (unsigned int)st[2];
    bd.bit_count = (int)st[3];

    for (i = 0; i < 24 * 16; i++)
        res[i] = 0;
    for (i = 0; i < 25; i++)
        nz[i] = 0;

    if (skip) {
        if (mb_has_y2)
            *above_y2 = *left_y2 = 0;
        for (i = 0; i < 4; i++)
            above_y[i] = left_y[i] = 0;
        for (i = 0; i < 2; i++) {
            above_u[i] = left_u[i] = 0;
            above_v[i] = left_v[i] = 0;
        }
        return 0;
    }
    {
        const uint8_t *probs_y = probs + (mb_has_y2 ? 0 : 3) * 8 * 3 * 11;
        int first = 0;
        int ynz[4][4];
        if (mb_has_y2) {
            int ctx = *above_y2 + *left_y2;
            int nz2 = block_tokens(&bd, probs + 1 * 8 * 3 * 11, ctx, 0,
                                   y2dc, y2ac, co);
            *above_y2 = *left_y2 = nz2;
            any_nz |= nz2;
            iwht4x4(co, dcs);
            have_dcs = 1;
            first = 1;
        }
        for (b = 0; b < 16; b++) {
            int sy = b >> 2, sx = b & 3;
            int a = (sy == 0) ? above_y[sx] : ynz[sy - 1][sx];
            int l = (sx == 0) ? left_y[sy] : ynz[sy][sx - 1];
            int32_t cob[16];
            int nzb = block_tokens(&bd, probs_y, a + l, first,
                                   y1dc, y1ac, cob);
            ynz[sy][sx] = nzb;
            nz[b] = nzb;
            any_nz |= nzb;
            if (have_dcs)
                cob[0] = dcs[b];
            idct4x4(cob, res + b * 16);
        }
        for (i = 0; i < 4; i++) {
            left_y[i] = ynz[i][3];
            above_y[i] = ynz[3][i];
        }
    }
    {
        int32_t *anz[2], *lnz[2];
        int pl;
        anz[0] = above_u;
        lnz[0] = left_u;
        anz[1] = above_v;
        lnz[1] = left_v;
        for (pl = 0; pl < 2; pl++) {
            int cnz[2][2];
            for (b = 0; b < 4; b++) {
                int sy = b >> 1, sx = b & 1;
                int a = (sy == 0) ? anz[pl][sx] : cnz[sy - 1][sx];
                int l = (sx == 0) ? lnz[pl][sy] : cnz[sy][sx - 1];
                int32_t cob[16];
                int nzb = block_tokens(
                    &bd, probs + 2 * 8 * 3 * 11, a + l, 0,
                    uvdc, uvac, cob);
                cnz[sy][sx] = nzb;
                nz[16 + pl * 4 + b] = nzb;
                any_nz |= nzb;
                idct4x4(cob, res + (16 + pl * 4 + b) * 16);
            }
            for (i = 0; i < 2; i++) {
                lnz[pl][i] = cnz[i][1];
                anz[pl][i] = cnz[1][i];
            }
        }
    }
    nz[24] = any_nz;
    st[0] = bd.pos;
    st[1] = bd.rng;
    st[2] = bd.value;
    st[3] = bd.bit_count;
    return any_nz;
}
