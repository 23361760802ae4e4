/* EBCOT Tier-1 hot kernel — optional native twin of the pure-Python
 * implementation in jp2.py (decode_codeblock / encode_codeblock).
 *
 * This is NOT a third-party library: it is the same from-scratch
 * ISO/IEC 15444-1 Annex C/D logic as the Python code, transcribed to
 * C because the MQ coder is inherently sequential per code-block and
 * a per-bit interpreted loop dominates decode time on real-world
 * image sizes. codecs/native.py compiles it on demand with the
 * system C compiler and falls back to the Python path when no
 * compiler is available — correctness never depends on this file
 * (tests assert native == Python on random blocks).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static const uint16_t QE[47] = {
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601};
static const uint8_t NMPS[47] = {
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17,
    18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46};
static const uint8_t NLPS[47] = {
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43,
    46};
static const uint8_t SW[47] = {
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0};

#define N_CTX 19
#define CTX_RL 17
#define CTX_UNI 18
#define F_SIG 1
#define F_VIS 2
#define F_REF 4

/* zero-coding context tables (Table D.1), built once */
static int8_t ZC[4][3][3][5];
static int zc_ready = 0;

static void build_zc(void)
{
    int hh, vv, dd;
    for (hh = 0; hh < 3; hh++)
        for (vv = 0; vv < 3; vv++)
            for (dd = 0; dd < 5; dd++) {
                int c;
                if (hh == 2) c = 8;
                else if (hh == 1) c = vv >= 1 ? 7 : (dd >= 1 ? 6 : 5);
                else {
                    if (vv == 2) c = 4;
                    else if (vv == 1) c = 3;
                    else c = dd >= 2 ? 2 : (dd == 1 ? 1 : 0);
                }
                ZC[0][hh][vv][dd] = (int8_t)c;   /* LL */
                ZC[2][hh][vv][dd] = (int8_t)c;   /* LH */
                ZC[1][vv][hh][dd] = (int8_t)c;   /* HL: swap h/v */
                {
                    int hv = hh + vv;
                    if (dd >= 3) c = 8;
                    else if (dd == 2) c = hv >= 1 ? 7 : 6;
                    else if (dd == 1)
                        c = hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
                    else c = hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
                    ZC[3][hh][vv][dd] = (int8_t)c;
                }
            }
    zc_ready = 1;
}

/* sign-coding (Table D.3): indexed by (hc+1)*3 + (vc+1) → ctx, xor */
static const uint8_t SC_CTX[9] = {13, 12, 11, 10, 9, 10, 11, 12, 13};
static const uint8_t SC_XOR[9] = {1, 1, 1, 1, 0, 0, 0, 0, 0};

/* ------------------------------------------------------------------ */
/* MQ decoder (Annex C)                                               */
/* ------------------------------------------------------------------ */

typedef struct {
    const uint8_t *data;
    int len, bp, ct;
    uint32_t c, a;
    uint8_t idx[N_CTX], mps[N_CTX];
} MQDec;

static void mqd_bytein(MQDec *m)
{
    int bp = m->bp;
    uint8_t cur = bp < m->len ? m->data[bp] : 0xFF;
    if (cur == 0xFF) {
        uint8_t nxt = bp + 1 < m->len ? m->data[bp + 1] : 0xFF;
        if (nxt > 0x8F) { m->c += 0xFF00; m->ct = 8; }
        else { m->bp = bp + 1; m->c += (uint32_t)nxt << 9; m->ct = 7; }
    } else {
        m->bp = bp + 1;
        {
            uint8_t nxt = bp + 1 < m->len ? m->data[bp + 1] : 0xFF;
            m->c += (uint32_t)nxt << 8;
            m->ct = 8;
        }
    }
}

static void mqd_init(MQDec *m, const uint8_t *d, int len)
{
    memset(m->idx, 0, N_CTX);
    memset(m->mps, 0, N_CTX);
    m->idx[0] = 4;
    m->idx[CTX_RL] = 3;
    m->idx[CTX_UNI] = 46;
    m->data = d;
    m->len = len;
    m->bp = 0;
    m->c = (uint32_t)(len > 0 ? d[0] : 0xFF) << 16;
    mqd_bytein(m);
    m->c <<= 7;
    m->ct -= 7;
    m->a = 0x8000;
}

static int mqd_decode(MQDec *m, int cx)
{
    int i = m->idx[cx];
    int mps = m->mps[cx];
    uint32_t qe = QE[i];
    int d;
    m->a -= qe;
    if (((m->c >> 16) & 0xFFFF) < qe) {
        if (m->a < qe) { d = mps; m->idx[cx] = NMPS[i]; }
        else {
            d = 1 - mps;
            if (SW[i]) m->mps[cx] = (uint8_t)(1 - mps);
            m->idx[cx] = NLPS[i];
        }
        m->a = qe;
    } else {
        m->c -= qe << 16;
        if (m->a & 0x8000) return mps;
        if (m->a < qe) {
            d = 1 - mps;
            if (SW[i]) m->mps[cx] = (uint8_t)(1 - mps);
            m->idx[cx] = NLPS[i];
        } else { d = mps; m->idx[cx] = NMPS[i]; }
    }
    do {
        if (m->ct == 0) mqd_bytein(m);
        m->a = (m->a << 1) & 0xFFFF;
        m->c <<= 1;
        m->ct--;
    } while (!(m->a & 0x8000));
    return d;
}

/* ------------------------------------------------------------------ */
/* T1 decode                                                          */
/* ------------------------------------------------------------------ */

typedef struct {
    int w, h, W2;
    uint8_t *flags;     /* (h+2)*(w+2) */
    int32_t *mag;       /* h*w */
    uint8_t *sign;      /* h*w */
    int8_t *last_up;    /* h*w */
    MQDec mq;
    const int8_t (*zc)[3][5];
} T1D;

static void t1d_neigh(T1D *t, int fy, int fx, int *hh, int *vv, int *dd)
{
    const uint8_t *f = t->flags + fy * t->W2 + fx;
    int W2 = t->W2;
    *hh = (f[-1] & 1) + (f[1] & 1);
    *vv = (f[-W2] & 1) + (f[W2] & 1);
    *dd = (f[-W2 - 1] & 1) + (f[-W2 + 1] & 1)
        + (f[W2 - 1] & 1) + (f[W2 + 1] & 1);
}

static int t1d_contrib(T1D *t, int yy, int xx)
{
    if (yy < 0 || yy >= t->h || xx < 0 || xx >= t->w) return 0;
    if (!(t->flags[(yy + 1) * t->W2 + xx + 1] & 1)) return 0;
    return t->sign[yy * t->w + xx] ? -1 : 1;
}

static void t1d_sign_ctx(T1D *t, int y, int x, int *ctx, int *xorv)
{
    int hc = t1d_contrib(t, y, x - 1) + t1d_contrib(t, y, x + 1);
    int vc = t1d_contrib(t, y - 1, x) + t1d_contrib(t, y + 1, x);
    if (hc < -1) hc = -1; else if (hc > 1) hc = 1;
    if (vc < -1) vc = -1; else if (vc > 1) vc = 1;
    *ctx = SC_CTX[(hc + 1) * 3 + (vc + 1)];
    *xorv = SC_XOR[(hc + 1) * 3 + (vc + 1)];
}

static void t1d_decode_sig(T1D *t, int y, int x, int p)
{
    int ctx, xorv;
    t1d_sign_ctx(t, y, x, &ctx, &xorv);
    {
        int s = mqd_decode(&t->mq, ctx) ^ xorv;
        t->sign[y * t->w + x] = (uint8_t)s;
    }
    t->mag[y * t->w + x] |= 1 << p;
    t->last_up[y * t->w + x] = (int8_t)p;
    t->flags[(y + 1) * t->W2 + x + 1] |= F_SIG;
}

static void t1d_spp(T1D *t, int p)
{
    int y0, x, y, h = t->h, w = t->w;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++)
            for (y = y0; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int hh, vv, dd;
                if (t->flags[fi] & F_SIG) continue;
                t1d_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                if (hh + vv + dd == 0) continue;
                if (mqd_decode(&t->mq,
                               t->zc[hh][vv][dd < 4 ? dd : 4]))
                    t1d_decode_sig(t, y, x, p);
                t->flags[fi] |= F_VIS;
            }
}

static void t1d_mrp(T1D *t, int p)
{
    int y0, x, y, h = t->h, w = t->w;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++)
            for (y = y0; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int fl = t->flags[fi];
                int ctx;
                if (!(fl & F_SIG) || (fl & F_VIS)) continue;
                if (fl & F_REF) ctx = 16;
                else {
                    int hh, vv, dd;
                    t1d_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                    ctx = (hh + vv + dd) ? 15 : 14;
                }
                if (mqd_decode(&t->mq, ctx))
                    t->mag[y * t->w + x] |= 1 << p;
                t->last_up[y * t->w + x] = (int8_t)p;
                t->flags[fi] |= F_REF;
            }
}

static void t1d_cleanup(T1D *t, int p)
{
    int y0, x, y, h = t->h, w = t->w, i, n;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++) {
            y = y0;
            if (y0 + 4 <= h) {
                int allclear = 1, yy;
                for (yy = y0; yy < y0 + 4; yy++) {
                    int fl = t->flags[(yy + 1) * t->W2 + x + 1];
                    int hh, vv, dd;
                    if (fl & (F_SIG | F_VIS)) { allclear = 0; break; }
                    t1d_neigh(t, yy + 1, x + 1, &hh, &vv, &dd);
                    if (hh + vv + dd) { allclear = 0; break; }
                }
                if (allclear) {
                    int r;
                    if (!mqd_decode(&t->mq, CTX_RL)) continue;
                    r = (mqd_decode(&t->mq, CTX_UNI) << 1)
                        | mqd_decode(&t->mq, CTX_UNI);
                    y = y0 + r;
                    t1d_decode_sig(t, y, x, p);
                    y++;
                }
            }
            for (; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int fl = t->flags[fi];
                int hh, vv, dd;
                if (fl & F_VIS) {
                    t->flags[fi] = (uint8_t)(fl & ~F_VIS);
                    continue;
                }
                if (fl & F_SIG) continue;
                t1d_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                if (mqd_decode(&t->mq,
                               t->zc[hh][vv][dd < 4 ? dd : 4]))
                    t1d_decode_sig(t, y, x, p);
            }
        }
    n = (t->h + 2) * t->W2;
    for (i = 0; i < n; i++) t->flags[i] &= (uint8_t)~F_VIS;
}

int t1_decode(const uint8_t *data, int len, int w, int h,
              int n_passes, int missing_msbs, int mb, int band,
              int64_t *out)
{
    T1D t;
    int n_planes = mb - missing_msbs;
    int i, p, passes, kind;
    if (!zc_ready) build_zc();
    memset(out, 0, (size_t)w * h * sizeof(int64_t));
    if (n_planes <= 0 || n_passes <= 0) return 0;
    if (n_planes > 31) return -1;
    t.w = w; t.h = h; t.W2 = w + 2;
    t.flags = (uint8_t *)calloc((size_t)(h + 2) * t.W2, 1);
    t.mag = (int32_t *)calloc((size_t)h * w, sizeof(int32_t));
    t.sign = (uint8_t *)calloc((size_t)h * w, 1);
    t.last_up = (int8_t *)calloc((size_t)h * w, 1);
    if (!t.flags || !t.mag || !t.sign || !t.last_up) {
        free(t.flags); free(t.mag); free(t.sign); free(t.last_up);
        return -2;
    }
    t.zc = ZC[band & 3];
    mqd_init(&t.mq, data, len);
    p = n_planes - 1;
    passes = 0;
    kind = 2;
    while (passes < n_passes && p >= 0) {
        if (kind == 0) t1d_spp(&t, p);
        else if (kind == 1) t1d_mrp(&t, p);
        else t1d_cleanup(&t, p);
        passes++;
        if (kind == 2) { p--; kind = 0; } else kind++;
    }
    for (i = 0; i < h * w; i++) {
        int64_t m = t.mag[i];
        if (m > 0) m += (int64_t)(1 << t.last_up[i]) >> 1;
        out[i] = t.sign[i] ? -m : m;
    }
    free(t.flags); free(t.mag); free(t.sign); free(t.last_up);
    return 0;
}

/* ------------------------------------------------------------------ */
/* MQ encoder (Annex C) + T1 encode                                   */
/* ------------------------------------------------------------------ */

typedef struct {
    uint32_t a, c;
    int ct;
    uint8_t idx[N_CTX], mps[N_CTX];
    uint8_t *out;
    int n, cap, b_valid, overflow;
} MQEnc;

static void mqe_init(MQEnc *m, uint8_t *buf, int cap)
{
    memset(m->idx, 0, N_CTX);
    memset(m->mps, 0, N_CTX);
    m->idx[0] = 4;
    m->idx[CTX_RL] = 3;
    m->idx[CTX_UNI] = 46;
    m->a = 0x8000;
    m->c = 0;
    m->ct = 12;
    m->out = buf;
    m->n = 0;
    m->cap = cap;
    m->b_valid = 0;
    m->overflow = 0;
}

static void mqe_push(MQEnc *m, uint8_t b)
{
    if (m->n >= m->cap) { m->overflow = 1; return; }
    m->out[m->n++] = b;
}

static void mqe_byteout(MQEnc *m)
{
    if (m->b_valid && m->n > 0 && m->out[m->n - 1] == 0xFF) {
        mqe_push(m, (uint8_t)((m->c >> 20) & 0xFF));
        m->c &= 0xFFFFF;
        m->ct = 7;
    } else if (m->c < 0x8000000) {
        mqe_push(m, (uint8_t)((m->c >> 19) & 0xFF));
        m->c &= 0x7FFFF;
        m->ct = 8;
    } else {
        if (m->n > 0) {
            m->out[m->n - 1]++;
            if (m->out[m->n - 1] == 0xFF) {
                m->c &= 0x7FFFFFF;
                mqe_push(m, (uint8_t)((m->c >> 20) & 0xFF));
                m->c &= 0xFFFFF;
                m->ct = 7;
                m->b_valid = 1;
                return;
            }
        }
        mqe_push(m, (uint8_t)((m->c >> 19) & 0xFF));
        m->c &= 0x7FFFF;
        m->ct = 8;
    }
    m->b_valid = 1;
}

static void mqe_renorm(MQEnc *m)
{
    do {
        m->a <<= 1;
        m->c <<= 1;
        m->ct--;
        if (m->ct == 0) mqe_byteout(m);
    } while (!(m->a & 0x8000));
}

static void mqe_encode(MQEnc *m, int cx, int d)
{
    int i = m->idx[cx];
    uint32_t qe = QE[i];
    if (d == m->mps[cx]) {
        m->a -= qe;
        if (!(m->a & 0x8000)) {
            if (m->a < qe) m->a = qe;
            else m->c += qe;
            m->idx[cx] = NMPS[i];
            mqe_renorm(m);
        } else m->c += qe;
    } else {
        m->a -= qe;
        if (m->a < qe) m->c += qe;
        else m->a = qe;
        if (SW[i]) m->mps[cx] = (uint8_t)(1 - m->mps[cx]);
        m->idx[cx] = NLPS[i];
        mqe_renorm(m);
    }
}

static int mqe_flush(MQEnc *m)
{
    uint32_t tempc = m->c + m->a;
    m->c |= 0xFFFF;
    if (m->c >= tempc) m->c -= 0x8000;
    m->c <<= m->ct;
    mqe_byteout(m);
    m->c <<= m->ct;
    mqe_byteout(m);
    while (m->n > 0 && m->out[m->n - 1] == 0xFF) m->n--;
    return m->overflow ? -1 : m->n;
}

typedef struct {
    int w, h, W2;
    uint8_t *flags;
    const int32_t *mag;
    const uint8_t *sign;
    MQEnc mq;
    const int8_t (*zc)[3][5];
} T1E;

static void t1e_neigh(T1E *t, int fy, int fx, int *hh, int *vv, int *dd)
{
    const uint8_t *f = t->flags + fy * t->W2 + fx;
    int W2 = t->W2;
    *hh = (f[-1] & 1) + (f[1] & 1);
    *vv = (f[-W2] & 1) + (f[W2] & 1);
    *dd = (f[-W2 - 1] & 1) + (f[-W2 + 1] & 1)
        + (f[W2 - 1] & 1) + (f[W2 + 1] & 1);
}

static int t1e_contrib(T1E *t, int yy, int xx)
{
    if (yy < 0 || yy >= t->h || xx < 0 || xx >= t->w) return 0;
    if (!(t->flags[(yy + 1) * t->W2 + xx + 1] & 1)) return 0;
    return t->sign[yy * t->w + xx] ? -1 : 1;
}

static void t1e_emit_sig(T1E *t, int y, int x)
{
    int hc = t1e_contrib(t, y, x - 1) + t1e_contrib(t, y, x + 1);
    int vc = t1e_contrib(t, y - 1, x) + t1e_contrib(t, y + 1, x);
    if (hc < -1) hc = -1; else if (hc > 1) hc = 1;
    if (vc < -1) vc = -1; else if (vc > 1) vc = 1;
    mqe_encode(&t->mq, SC_CTX[(hc + 1) * 3 + (vc + 1)],
               t->sign[y * t->w + x] ^ SC_XOR[(hc + 1) * 3 + (vc + 1)]);
    t->flags[(y + 1) * t->W2 + x + 1] |= F_SIG;
}

static void t1e_spp(T1E *t, int p)
{
    int y0, x, y, h = t->h, w = t->w;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++)
            for (y = y0; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int hh, vv, dd, b;
                if (t->flags[fi] & F_SIG) continue;
                t1e_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                if (hh + vv + dd == 0) continue;
                b = (t->mag[y * w + x] >> p) & 1;
                mqe_encode(&t->mq, t->zc[hh][vv][dd < 4 ? dd : 4], b);
                if (b) t1e_emit_sig(t, y, x);
                t->flags[fi] |= F_VIS;
            }
}

static void t1e_mrp(T1E *t, int p)
{
    int y0, x, y, h = t->h, w = t->w;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++)
            for (y = y0; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int fl = t->flags[fi];
                int ctx;
                if (!(fl & F_SIG) || (fl & F_VIS)) continue;
                if (fl & F_REF) ctx = 16;
                else {
                    int hh, vv, dd;
                    t1e_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                    ctx = (hh + vv + dd) ? 15 : 14;
                }
                mqe_encode(&t->mq, ctx, (t->mag[y * w + x] >> p) & 1);
                t->flags[fi] |= F_REF;
            }
}

static void t1e_cleanup(T1E *t, int p)
{
    int y0, x, y, h = t->h, w = t->w, i, n;
    for (y0 = 0; y0 < h; y0 += 4)
        for (x = 0; x < w; x++) {
            y = y0;
            if (y0 + 4 <= h) {
                int allclear = 1, yy;
                for (yy = y0; yy < y0 + 4; yy++) {
                    int fl = t->flags[(yy + 1) * t->W2 + x + 1];
                    int hh, vv, dd;
                    if (fl & (F_SIG | F_VIS)) { allclear = 0; break; }
                    t1e_neigh(t, yy + 1, x + 1, &hh, &vv, &dd);
                    if (hh + vv + dd) { allclear = 0; break; }
                }
                if (allclear) {
                    int first = -1, yy;
                    for (yy = y0; yy < y0 + 4; yy++)
                        if ((t->mag[yy * w + x] >> p) & 1) {
                            first = yy - y0;
                            break;
                        }
                    if (first < 0) {
                        mqe_encode(&t->mq, CTX_RL, 0);
                        continue;
                    }
                    mqe_encode(&t->mq, CTX_RL, 1);
                    mqe_encode(&t->mq, CTX_UNI, (first >> 1) & 1);
                    mqe_encode(&t->mq, CTX_UNI, first & 1);
                    y = y0 + first;
                    t1e_emit_sig(t, y, x);
                    y++;
                }
            }
            for (; y < y0 + 4 && y < h; y++) {
                int fi = (y + 1) * t->W2 + x + 1;
                int fl = t->flags[fi];
                int hh, vv, dd, b;
                if (fl & F_VIS) {
                    t->flags[fi] = (uint8_t)(fl & ~F_VIS);
                    continue;
                }
                if (fl & F_SIG) continue;
                t1e_neigh(t, y + 1, x + 1, &hh, &vv, &dd);
                b = (t->mag[y * w + x] >> p) & 1;
                mqe_encode(&t->mq, t->zc[hh][vv][dd < 4 ? dd : 4], b);
                if (b) t1e_emit_sig(t, y, x);
            }
        }
    n = (t->h + 2) * t->W2;
    for (i = 0; i < n; i++) t->flags[i] &= (uint8_t)~F_VIS;
}

/* coef: h*w signed int32. Returns encoded length (>=0) or <0 error.
 * out_npasses / out_missing mirror encode_codeblock's returns. */
int t1_encode(const int32_t *coef, int w, int h, int band, int mb,
              uint8_t *outbuf, int outcap,
              int *out_npasses, int *out_missing)
{
    T1E t;
    int i, n_planes = 0, p, kind, done, n_passes, rc;
    int32_t *mag;
    uint8_t *sign;
    int32_t maxmag = 0;
    if (!zc_ready) build_zc();
    mag = (int32_t *)malloc((size_t)h * w * sizeof(int32_t));
    sign = (uint8_t *)malloc((size_t)h * w);
    t.flags = (uint8_t *)calloc((size_t)(h + 2) * (w + 2), 1);
    if (!mag || !sign || !t.flags) {
        free(mag); free(sign); free(t.flags);
        return -2;
    }
    for (i = 0; i < h * w; i++) {
        int32_t v = coef[i];
        sign[i] = v < 0;
        mag[i] = v < 0 ? -v : v;
        if (mag[i] > maxmag) maxmag = mag[i];
    }
    while ((1 << n_planes) <= maxmag) n_planes++;
    *out_missing = mb - n_planes;
    if (n_planes == 0) {
        *out_npasses = 0;
        free(mag); free(sign); free(t.flags);
        return 0;
    }
    t.w = w; t.h = h; t.W2 = w + 2;
    t.mag = mag;
    t.sign = sign;
    t.zc = ZC[band & 3];
    mqe_init(&t.mq, outbuf, outcap);
    n_passes = 3 * n_planes - 2;
    p = n_planes - 1;
    kind = 2;
    done = 0;
    while (done < n_passes) {
        if (kind == 0) t1e_spp(&t, p);
        else if (kind == 1) t1e_mrp(&t, p);
        else t1e_cleanup(&t, p);
        done++;
        if (kind == 2) { p--; kind = 0; } else kind++;
    }
    rc = mqe_flush(&t.mq);
    *out_npasses = n_passes;
    free(mag); free(sign); free(t.flags);
    return rc;
}
