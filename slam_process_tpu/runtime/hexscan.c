/* hexscan.c — native hex-token scanner for the serial-log ingest path.
 *
 * Token grammar (serial_hex_to_excel_v3.py:16): whitespace-separated tokens
 * that are either two hex digits or "0x"/"0X" + two hex digits; everything
 * else is skipped.  Byte-level semantics identical to
 * slam_process_tpu.io.hexlog.tokenize_hex (equivalence asserted in
 * tests/test_runtime.py).
 *
 * Exposed as a tiny C ABI for ctypes:
 *   size_t hexscan_tokenize(const uint8_t *in, size_t n, uint8_t *out);
 * `out` must have room for n/2 bytes (every emitted byte consumes >= 2
 * input chars + separator).  Returns the number of bytes written.
 *
 * Single pass, branch-light, ~1 GB/s on one core — the pure-python
 * reference regex loop does ~1.5 MB/s, the numpy vectorized path ~100 MB/s.
 */

#include <stddef.h>
#include <stdint.h>

static const uint8_t HEX[256] = {
    /* 0x00 */ 255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    /* 0x10 */ 255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    /* 0x20 */ 255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    /* 0x30 */ 0,1,2,3,4,5,6,7,8,9,255,255,255,255,255,255,
    /* 0x40 */ 255,10,11,12,13,14,15,255,255,255,255,255,255,255,255,255,
    /* 0x50 */ 255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    /* 0x60 */ 255,10,11,12,13,14,15,255,255,255,255,255,255,255,255,255,
    /* 0x70 */ 255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    /* 0x80.. all 255 */
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
    255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,255,
};

static inline int is_ws(uint8_t c) {
    return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == 0x0b ||
           c == 0x0c || c == 0x1c || c == 0x1d || c == 0x1e || c == 0x1f;
}

size_t hexscan_tokenize(const uint8_t *in, size_t n, uint8_t *out) {
    size_t i = 0, w = 0;
    while (i < n) {
        /* skip whitespace */
        while (i < n && is_ws(in[i])) i++;
        if (i >= n) break;
        /* token = [start, end) */
        size_t start = i;
        while (i < n && !is_ws(in[i])) i++;
        size_t len = i - start;
        if (len == 2) {
            uint8_t hi = HEX[in[start]], lo = HEX[in[start + 1]];
            if (hi != 255 && lo != 255)
                out[w++] = (uint8_t)((hi << 4) | lo);
        } else if (len == 4 && in[start] == '0' &&
                   (in[start + 1] == 'x' || in[start + 1] == 'X')) {
            uint8_t hi = HEX[in[start + 2]], lo = HEX[in[start + 3]];
            if (hi != 255 && lo != 255)
                out[w++] = (uint8_t)((hi << 4) | lo);
        }
    }
    return w;
}
