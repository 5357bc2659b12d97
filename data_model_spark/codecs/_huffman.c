/* Baseline JPEG (ITU-T T.81) entropy-scan decoder — the per-symbol loop of
 * codecs/jpeg.py:decode_jpeg_gray8 compiled to C.  Same algorithm, same
 * 16-bit canonical-Huffman peek tables, same output coefficients; the
 * Python wrapper (jpeg.py) verifies availability at import and falls back
 * to the pure-Python loop when compilation is unavailable.
 *
 * decode_scan(scan, scan_len, dc_peek, ac_peek, n_blocks, out) -> 0 ok
 *   scan:    unstuffed entropy bytes, padded with >=3 zero bytes
 *   dc/ac:   uint32[65536] tables, entry = (symbol << 8) | code_length
 *   out:     int32[n_blocks * 64] zigzag-order coefficients (zeroed by caller)
 */
#include <stdint.h>

int decode_scan(const unsigned char *buf, long scan_len,
                const uint32_t *tdc, const uint32_t *tac,
                long n_blocks, int32_t *out) {
    long pos = 0;                 /* bit position */
    long limit = (scan_len + 3) * 8;
    int32_t pred = 0;
    for (long b = 0; b < n_blocks; b++) {
        int32_t *blk = out + b * 64;
        long byte = pos >> 3;
        if (pos > limit) return 1;
        uint32_t peek = ((((uint32_t)buf[byte] << 16) |
                          ((uint32_t)buf[byte + 1] << 8) |
                          (uint32_t)buf[byte + 2]) >> (8 - (pos & 7))) & 0xFFFF;
        uint32_t e = tdc[peek];
        uint32_t ln = e & 0xFF;
        uint32_t s = e >> 8;
        if (ln == 0) return 2;    /* invalid code */
        pos += ln;
        if (s) {
            byte = pos >> 3;
            uint32_t v = ((((uint32_t)buf[byte] << 16) |
                           ((uint32_t)buf[byte + 1] << 8) |
                           (uint32_t)buf[byte + 2]) >> (24 - (pos & 7) - s)) &
                         ((1u << s) - 1u);
            pos += s;
            pred += (v >= (1u << (s - 1))) ? (int32_t)v
                                           : (int32_t)v - (int32_t)(1u << s) + 1;
        }
        blk[0] = pred;
        int k = 1;
        while (k < 64) {
            if (pos > limit) return 1;
            byte = pos >> 3;
            peek = ((((uint32_t)buf[byte] << 16) |
                     ((uint32_t)buf[byte + 1] << 8) |
                     (uint32_t)buf[byte + 2]) >> (8 - (pos & 7))) & 0xFFFF;
            e = tac[peek];
            ln = e & 0xFF;
            if (ln == 0) return 2;
            pos += ln;
            uint32_t sym = e >> 8;
            if (sym == 0x00) break;            /* EOB */
            if (sym == 0xF0) { k += 16; continue; }  /* ZRL */
            k += (int)(sym >> 4);
            s = sym & 0x0F;
            if (s == 0) return 4;  /* invalid (run,0) symbol: python path raises */
            byte = pos >> 3;
            uint32_t v = ((((uint32_t)buf[byte] << 16) |
                           ((uint32_t)buf[byte + 1] << 8) |
                           (uint32_t)buf[byte + 2]) >> (24 - (pos & 7) - s)) &
                         ((1u << s) - 1u);
            pos += s;
            if (k > 63) return 3;
            blk[k] = (v >= (1u << (s - 1))) ? (int32_t)v
                                            : (int32_t)v - (int32_t)(1u << s) + 1;
            k += 1;
        }
    }
    return 0;
}
