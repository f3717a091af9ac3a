/*
 * Native AV1 range encoder + transform-block coefficient writer.
 *
 * Mirrors the Python behavioral reference (entropy/range_coder.py,
 * codec/txb.py) byte-for-byte; parity is enforced by tests
 * (tests/test_native_entropy.py). This is the production host-side coder
 * consuming device-computed levels (reference analog:
 * Source/Lib/Codec/bitstream_unit.c od_ec + entropy_coding.c
 * av1_write_coeffs_txb_1d).
 *
 * CDF layout matches the numpy tables: int32, length nsyms+1, inverse-CDF
 * Q15 with trailing adaptation counter. Adaptation happens in place so
 * Python-side and C-side symbol writes share one context state.
 *
 * Build: gcc -O3 -shared -fPIC entropy.c -o libsvtav1_entropy.so
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4

typedef struct {
    uint32_t low;
    uint32_t rng;
    int cnt;
    uint16_t *pre;
    size_t n, cap;
} Ec;

static void ec_grow(Ec *e, size_t need) {
    if (e->n + need > e->cap) {
        e->cap = (e->cap * 2 > e->n + need) ? e->cap * 2 : (e->n + need + 4096);
        e->pre = (uint16_t *)realloc(e->pre, e->cap * sizeof(uint16_t));
    }
}

Ec *ec_create(void) {
    Ec *e = (Ec *)calloc(1, sizeof(Ec));
    e->low = 0;
    e->rng = 0x8000;
    e->cnt = -9;
    e->cap = 1 << 16;
    e->pre = (uint16_t *)malloc(e->cap * sizeof(uint16_t));
    e->n = 0;
    return e;
}

void ec_free(Ec *e) {
    if (e) {
        free(e->pre);
        free(e);
    }
}

static int ilog_nz(uint32_t v) { /* bit length */
    int r = 0;
    while (v) {
        r++;
        v >>= 1;
    }
    return r;
}

static void ec_normalize(Ec *e, uint32_t low, uint32_t rng) {
    int d = 16 - ilog_nz(rng);
    int c = e->cnt;
    int s = c + d;
    if (s >= 0) {
        ec_grow(e, 2);
        c += 16;
        uint32_t m = ((uint32_t)1 << c) - 1;
        if (s >= 8) {
            e->pre[e->n++] = (uint16_t)(low >> c);
            low &= m;
            c -= 8;
            m >>= 8;
        }
        e->pre[e->n++] = (uint16_t)(low >> c);
        s = c + d - 24;
        low &= m;
    }
    e->low = low << d;
    e->rng = rng << d;
    e->cnt = s;
}

void ec_encode_symbol(Ec *e, int32_t *icdf, int nsyms, int sym, int update) {
    uint32_t low = e->low;
    uint32_t r = e->rng;
    int N = nsyms - 1;
    uint32_t fh = (sym < N) ? (uint32_t)icdf[sym] : 0u;
    uint32_t u, v;
    if (sym > 0) {
        uint32_t fl = (uint32_t)icdf[sym - 1];
        u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (N - (sym - 1));
        v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (N - sym);
        low += r - u;
        r = u - v;
    } else {
        v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (N - sym);
        r -= v;
    }
    ec_normalize(e, low, r);
    if (update) {
        int count = icdf[nsyms];
        int n2 = nsyms, speed = 0;
        while (n2 > 1) {
            speed++;
            n2 >>= 1;
        } /* floor(log2(nsyms)) */
        if (speed > 2)
            speed = 2;
        int rate = 3 + (count > 15) + (count > 31) + speed;
        int32_t tmp = 32768;
        for (int i = 0; i < nsyms - 1; i++) {
            if (i == sym)
                tmp = 0;
            int32_t cur = icdf[i];
            icdf[i] = (tmp < cur) ? cur - ((cur - tmp) >> rate) : cur + ((tmp - cur) >> rate);
        }
        if (count < 32)
            icdf[nsyms] = count + 1;
    }
}

void ec_encode_bool(Ec *e, int bit, int f_q15) {
    int32_t icdf[3] = {f_q15, 0, 0};
    ec_encode_symbol(e, icdf, 2, bit, 0);
}

void ec_encode_literal(Ec *e, uint32_t val, int nbits) {
    for (int i = nbits - 1; i >= 0; i--) ec_encode_bool(e, (val >> i) & 1, 16384);
}

int64_t ec_done(Ec *e, uint8_t *out, int64_t cap) {
    uint32_t low = e->low;
    int c = e->cnt;
    int s = 10 + c;
    uint32_t m = 0x3FFF;
    uint64_t ee = ((uint64_t)low + m) & ~(uint64_t)m;
    ee |= m + 1;
    size_t n = e->n;
    uint16_t *tmp = (uint16_t *)malloc((n + 8) * sizeof(uint16_t));
    memcpy(tmp, e->pre, n * sizeof(uint16_t));
    if (s > 0) {
        uint64_t mask = (((uint64_t)1 << (c + 16)) - 1);
        do {
            tmp[n++] = (uint16_t)(ee >> (c + 16));
            ee &= mask;
            s -= 8;
            c -= 8;
            mask >>= 8;
        } while (s > 0);
    }
    if ((int64_t)n > cap) {
        free(tmp);
        return -1;
    }
    uint32_t carry = 0;
    for (int64_t i = (int64_t)n - 1; i >= 0; i--) {
        uint32_t vv = tmp[i] + carry;
        out[i] = (uint8_t)vv;
        carry = vv >> 8;
    }
    free(tmp);
    return (int64_t)n;
}

/* ------------------------------------------------------------------------ */
/* coefficient coding (codec/txb.py twin)                                   */
/* ------------------------------------------------------------------------ */

#define TX_CLASS_2D 0
#define TX_CLASS_HORIZ 1
#define TX_CLASS_VERT 2
#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4

static const int16_t eob_group_start[12] = {0, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513};
static const int16_t eob_offset_bits[12] = {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};
static const int32_t nz_map_ctx_offset_1d[32] = {0, 5, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10,
                                                 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10};

static inline int c3(int v) { return v < 3 ? v : 3; }

static int get_base_ctx(const uint8_t *pad, int stride, int pos, int bwl, int tx_class,
                        const int32_t *off2d) {
    if ((tx_class | pos) == 0)
        return 0;
    int row = pos >> bwl, col = pos & ((1 << bwl) - 1);
    const uint8_t *p = pad + row * stride + col;
    int mag = c3(p[1]) + c3(p[stride]);
    if (tx_class == TX_CLASS_2D)
        mag += c3(p[stride + 1]) + c3(p[2]) + c3(p[2 * stride]);
    else if (tx_class == TX_CLASS_VERT)
        mag += c3(p[2 * stride]) + c3(p[3 * stride]) + c3(p[4 * stride]);
    else
        mag += c3(p[2]) + c3(p[3]) + c3(p[4]);
    int ctx = (mag + 1) >> 1;
    if (ctx > 4)
        ctx = 4;
    if (tx_class == TX_CLASS_2D)
        return ctx + off2d[pos];
    return ctx + nz_map_ctx_offset_1d[tx_class == TX_CLASS_HORIZ ? col : row];
}

static int get_br_ctx(const uint8_t *pad, int stride, int pos, int bwl, int tx_class) {
    int row = pos >> bwl, col = pos & ((1 << bwl) - 1);
    const uint8_t *p = pad + row * stride + col;
    int mag = p[1] + p[stride];
    if (tx_class == TX_CLASS_2D)
        mag += p[stride + 1];
    else if (tx_class == TX_CLASS_VERT)
        mag += p[2 * stride];
    else
        mag += p[2];
    mag = (mag + 1) >> 1;
    if (mag > 6)
        mag = 6;
    if (pos == 0)
        return mag;
    if ((tx_class == TX_CLASS_2D && row < 2 && col < 2) || (tx_class == TX_CLASS_HORIZ && col == 0) ||
        (tx_class == TX_CLASS_VERT && row == 0))
        return mag + 7;
    return mag + 14;
}

static void write_golomb(Ec *e, int level) {
    int x = level + 1;
    int len = ilog_nz((uint32_t)x);
    for (int i = 0; i < len - 1; i++) ec_encode_bool(e, 0, 16384);
    for (int i = len - 1; i >= 0; i--) ec_encode_bool(e, (x >> i) & 1, 16384);
}

/* Write everything after txb_skip for one txb. Returns cul_level. */
int32_t ec_write_txb_body(Ec *e, const int32_t *coeffs, int w, int h, const int32_t *scan,
                          int tx_class, int txs_ctx_unused, int plane_type_unused, int dc_sign_ctx,
                          int update, int32_t *eob_cdf, int eob_nsyms, int32_t *eob_extra_cdf,
                          int32_t *base_eob_cdf, int32_t *base_cdf, int32_t *br_cdf,
                          int32_t *dc_sign_cdf_row, const int32_t *off2d) {
    (void)txs_ctx_unused;
    (void)plane_type_unused;
    int bwl = 0;
    while ((1 << bwl) < w) bwl++;
    int npix = w * h;
    int eob = 0;
    for (int i = npix - 1; i >= 0; i--) {
        if (coeffs[scan[i]]) {
            eob = i + 1;
            break;
        }
    }
    /* caller guarantees eob > 0 */
    int stride = w + 4;
    uint8_t *pad = (uint8_t *)calloc((size_t)(h + 4) * stride, 1);
    for (int r = 0; r < h; r++)
        for (int cdx = 0; cdx < w; cdx++) {
            int32_t v = coeffs[r * w + cdx];
            if (v < 0)
                v = -v;
            pad[r * stride + cdx] = v > 127 ? 127 : (uint8_t)v;
        }

    /* eob_pt */
    int eob_pt = 0;
    for (int t = 11; t >= 0; t--) {
        if (eob >= eob_group_start[t]) {
            eob_pt = t;
            break;
        }
    }
    int eob_extra = eob - eob_group_start[eob_pt];
    ec_encode_symbol(e, eob_cdf, eob_nsyms, eob_pt - 1, update);
    int ob = eob_offset_bits[eob_pt];
    if (ob > 0) {
        int bit = (eob_extra >> (ob - 1)) & 1;
        ec_encode_symbol(e, eob_extra_cdf + eob_pt * 3, 2, bit, update);
        for (int i = 1; i < ob; i++) ec_encode_bool(e, (eob_extra >> (ob - 1 - i)) & 1, 16384);
    }

    for (int ci = eob - 1; ci >= 0; ci--) {
        int pos = scan[ci];
        int32_t v = coeffs[pos];
        int level = v < 0 ? -v : v;
        if (ci == eob - 1) {
            int ctx;
            if (ci == 0)
                ctx = 0;
            else if (ci <= npix / 8)
                ctx = 1;
            else if (ci <= npix / 4)
                ctx = 2;
            else
                ctx = 3;
            int s = (level < 3 ? level : 3) - 1;
            ec_encode_symbol(e, base_eob_cdf + ctx * 4, 3, s, update);
        } else {
            int ctx = get_base_ctx(pad, stride, pos, bwl, tx_class, off2d);
            int s = level < 3 ? level : 3;
            ec_encode_symbol(e, base_cdf + ctx * 5, 4, s, update);
        }
        if (level > NUM_BASE_LEVELS) {
            int base_range = level - 1 - NUM_BASE_LEVELS;
            int brc = get_br_ctx(pad, stride, pos, bwl, tx_class);
            for (int idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
                int k = base_range - idx;
                if (k > BR_CDF_SIZE - 1)
                    k = BR_CDF_SIZE - 1;
                ec_encode_symbol(e, br_cdf + brc * 5, BR_CDF_SIZE, k, update);
                if (k < BR_CDF_SIZE - 1)
                    break;
            }
        }
    }

    int32_t cul_level = 0;
    for (int ci = 0; ci < eob; ci++) {
        int pos = scan[ci];
        int32_t v = coeffs[pos];
        int level = v < 0 ? -v : v;
        cul_level += level;
        if (level) {
            int sign = v < 0;
            if (ci == 0)
                ec_encode_symbol(e, dc_sign_cdf_row, 2, sign, update);
            else
                ec_encode_bool(e, sign, 16384);
            if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
                write_golomb(e, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS);
        }
    }
    free(pad);
    if (cul_level > 63)
        cul_level = 63;
    int32_t dc = coeffs[0];
    if (dc < 0)
        cul_level |= 1 << 6;
    else if (dc > 0)
        cul_level += 2 << 6;
    return cul_level;
}
