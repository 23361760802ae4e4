/* VP8L predictor-transform inverse — native twin of the per-pixel
 * Python loop in webp.py (_inverse_transform, ttype 0). The
 * recurrence is inherently sequential (every pixel's prediction
 * reads its already-reconstructed neighbors), so the Python loop is
 * the bottleneck on megapixel lossless WebPs. Semantics transcribed
 * 1:1 from the spec-derived Python (linear-array neighbor rule: the
 * top-right of the last column wraps to the current row's start, as
 * in libwebp). Built on demand by codecs/native.py; tests assert
 * native == Python on random images.
 */
#include <stdint.h>

static void unpack(uint32_t v, int c[4])
{
    c[0] = (v >> 24) & 0xFF;
    c[1] = (v >> 16) & 0xFF;
    c[2] = (v >> 8) & 0xFF;
    c[3] = v & 0xFF;
}

static void avg2(const int a[4], const int b[4], int o[4])
{
    int i;
    for (i = 0; i < 4; i++) o[i] = (a[i] + b[i]) >> 1;
}

int vp8l_pred_inverse(uint32_t *pix, int w, int h,
                      const uint8_t *modes, int tw, int bits)
{
    long pos, n = (long)w * h;
    for (pos = 0; pos < n; pos++) {
        int y = (int)(pos / w), x = (int)(pos % w);
        int cur[4], pred[4], L[4], T[4], TL[4], TR[4], t1[4], t2[4];
        int i, mode;
        unpack(pix[pos], cur);
        if (pos == 0) {
            pred[0] = 255; pred[1] = pred[2] = pred[3] = 0;
        } else if (y == 0) {
            unpack(pix[pos - 1], pred);
        } else if (x == 0) {
            unpack(pix[pos - w], pred);
        } else {
            mode = modes[(y >> bits) * tw + (x >> bits)];
            unpack(pix[pos - 1], L);
            unpack(pix[pos - w], T);
            unpack(pix[pos - w - 1], TL);
            unpack(pix[pos - w + 1], TR);
            switch (mode) {
            case 0:
                pred[0] = 255; pred[1] = pred[2] = pred[3] = 0;
                break;
            case 1: for (i = 0; i < 4; i++) pred[i] = L[i]; break;
            case 2: for (i = 0; i < 4; i++) pred[i] = T[i]; break;
            case 3: for (i = 0; i < 4; i++) pred[i] = TR[i]; break;
            case 4: for (i = 0; i < 4; i++) pred[i] = TL[i]; break;
            case 5:
                avg2(L, TR, t1); avg2(t1, T, pred); break;
            case 6: avg2(L, TL, pred); break;
            case 7: avg2(L, T, pred); break;
            case 8: avg2(TL, T, pred); break;
            case 9: avg2(T, TR, pred); break;
            case 10:
                avg2(L, TL, t1); avg2(T, TR, t2);
                avg2(t1, t2, pred); break;
            case 11: {                    /* Select */
                int pl = 0, pt = 0;
                for (i = 0; i < 4; i++) {
                    int p = L[i] + T[i] - TL[i];
                    int dl = p - L[i], dt = p - T[i];
                    pl += dl < 0 ? -dl : dl;
                    pt += dt < 0 ? -dt : dt;
                }
                for (i = 0; i < 4; i++)
                    pred[i] = pl < pt ? L[i] : T[i];
                break;
            }
            case 12:                      /* ClampAddSubtractFull */
                for (i = 0; i < 4; i++) {
                    int v = L[i] + T[i] - TL[i];
                    pred[i] = v < 0 ? 0 : (v > 255 ? 255 : v);
                }
                break;
            case 13: {                    /* ClampAddSubtractHalf */
                for (i = 0; i < 4; i++) {
                    int ave = (L[i] + T[i]) >> 1;
                    int d = ave - TL[i];
                    int v = ave + ((d + (d < 0)) >> 1);
                    pred[i] = v < 0 ? 0 : (v > 255 ? 255 : v);
                }
                break;
            }
            default:
                return -1;
            }
        }
        pix[pos] = ((uint32_t)((cur[0] + pred[0]) & 0xFF) << 24)
                 | ((uint32_t)((cur[1] + pred[1]) & 0xFF) << 16)
                 | ((uint32_t)((cur[2] + pred[2]) & 0xFF) << 8)
                 | (uint32_t)((cur[3] + pred[3]) & 0xFF);
    }
    return 0;
}
