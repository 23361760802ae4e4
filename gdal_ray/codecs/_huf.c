/* Native twin of the OpenEXR PIZ Huffman decode loop in exr_piz.py
 * (_huf_decode): same spec-derived logic as the pure-Python
 * implementation — 14-bit fast table, canonical long-code ranges
 * per length, run-length pseudo-symbol with the 8-bit repeat count,
 * and the trailing-bits drain.  Built on demand by codecs/native.py;
 * tests assert native == Python on random inputs.
 *
 * Returns 0 on success, negative on corrupt input.
 */

#include <stdint.h>
#include <string.h>

#define DECBITS 14
#define DECMASK ((1 << DECBITS) - 1)

/* long_base[l]  : first canonical code of length l (l in 15..58)
 * long_off[l]   : offset into long_syms[] of that length's symbols
 * long_cnt[l]   : number of symbols with that length
 * long_syms[]   : symbol values, per length, in canonical order     */
int huf_decode(const unsigned char *data, long nbytes, long nbits,
               const int32_t *fast_len, const int32_t *fast_sym,
               const int64_t *long_base, const int64_t *long_off,
               const int64_t *long_cnt, const int32_t *long_syms,
               long rlc, uint16_t *out, long nout)
{
    unsigned __int128 c = 0;
    int lc = 0;
    long pos = 0;
    long end = (nbits + 7) >> 3;
    long oi = 0;
    if (end > nbytes) return -1;

    while (pos < end) {
        c = (c << 8) | data[pos++];
        lc += 8;
        while (lc >= DECBITS) {
            long idx = (long)((c >> (lc - DECBITS)) & DECMASK);
            int l = fast_len[idx];
            long sym;
            if (l) {
                sym = fast_sym[idx];
                lc -= l;
            } else {
                int ll;
                sym = -1;
                for (ll = DECBITS + 1; ll < 59; ll++) {
                    if (!long_cnt[ll]) continue;
                    while (lc < ll && pos < end) {
                        c = (c << 8) | data[pos++];
                        lc += 8;
                    }
                    if (lc < ll) break;
                    {
                        int64_t cand = (int64_t)((c >> (lc - ll))
                            & (((unsigned __int128)1 << ll) - 1));
                        int64_t rel = cand - long_base[ll];
                        if (rel >= 0 && rel < long_cnt[ll]) {
                            sym = long_syms[long_off[ll] + rel];
                            lc -= ll;
                            break;
                        }
                    }
                }
                if (sym < 0) return -2;
            }
            if (sym == rlc) {
                long run;
                while (lc < 8 && pos < end) {
                    c = (c << 8) | data[pos++];
                    lc += 8;
                }
                if (lc < 8) return -3;
                run = (long)((c >> (lc - 8)) & 0xFF);
                lc -= 8;
                if (oi == 0 || oi + run > nout) return -4;
                {
                    uint16_t prev = out[oi - 1];
                    long k;
                    for (k = 0; k < run; k++) out[oi + k] = prev;
                    oi += run;
                }
            } else {
                if (oi >= nout) return -5;
                out[oi++] = (uint16_t)sym;
            }
            if (oi >= nout) return 0;
        }
    }

    /* drain trailing bits: drop the final byte's padding first */
    {
        int i = (8 - (int)(nbits & 7)) & 7;
        c >>= i;
        lc -= i;
        while (lc > 0) {
            long idx = (long)((c << (DECBITS - lc)) & DECMASK);
            int l = fast_len[idx];
            if (l && l <= lc) {
                long sym = fast_sym[idx];
                lc -= l;
                if (sym == rlc) {
                    long run;
                    if (lc < 8 || oi == 0) return -6;
                    run = (long)((c >> (lc - 8)) & 0xFF);
                    lc -= 8;
                    if (oi + run > nout) return -7;
                    {
                        uint16_t prev = out[oi - 1];
                        long k;
                        for (k = 0; k < run; k++) out[oi + k] = prev;
                        oi += run;
                    }
                } else {
                    if (oi >= nout) return -8;
                    out[oi++] = (uint16_t)sym;
                }
                if (oi >= nout) return 0;
            } else {
                return -9;
            }
        }
    }
    return (oi == nout) ? 0 : -10;
}
