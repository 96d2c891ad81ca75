// forge3d_tpu/codec/native/laz.cpp
// Compressed LAS ("LAZ"-architecture) point codec: adaptive arithmetic
// coding + predictive integer compression + per-item predictors, chunked.
//
// Reference behavior being matched (not copied): the reference links the
// las/laz crates (Cargo.toml:91-93) to decode LAZ/COPC point clouds
// (src/pointcloud/). This implementation follows the LASzip architecture
// (FastAC-style adaptive arithmetic coder, k-bit corrector integer
// compressor, POINT10/GPSTIME/RGB item predictors, pointwise chunking)
// but is an independent implementation whose corrector mapping and item
// context schedules are its own. Files written here declare custom item
// versions (0x8000 | n) in the LAZ VLR so foreign LASzip decoders FAIL
// CLOSED instead of misdecoding, and this decoder likewise fails closed
// on foreign (genuine LASzip) item versions — no validation fixture
// exists in this environment to prove bit-compatibility, and a silently
// wrong decode would violate the repo's fail-closed policy (decode also
// bounds-checks results). Round-trip correctness is tested in
// tests/test_laz.py.
//
// Wire format (all little-endian):
//   stream  := chunk* chunk_table
//   chunk   := arithmetic-coded run of <= chunk_size points; the first
//              point of each chunk is stored raw (uncompressed record)
//   chunk_table (written at the end; offset tracked by the caller):
//              u32 magic 'F3CT', u32 n_chunks, u32 compressed_size[n]
// Items: POINT10 (20 B), GPSTIME11 (8 B), RGB12 (6 B) — formats 0-3.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

typedef uint8_t  u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef int8_t   i8;
typedef int16_t  i16;
typedef int32_t  i32;
typedef int64_t  i64;

// ---------------------------------------------------------------------------
// Adaptive arithmetic coder (FastAC-style: 32-bit range, byte renorm)
// ---------------------------------------------------------------------------

static const u32 AC_MIN_LENGTH = 0x01000000u;
static const u32 DM_LENGTH_SHIFT = 15;
static const u32 DM_MAX_COUNT = 1u << 13;

struct Model {
    std::vector<u32> dist;     // scaled cumulative distribution
    std::vector<u32> count;
    u32 nsym = 0, total = 0, update_cycle = 0, until_update = 0;

    void init(u32 n) {
        nsym = n;
        dist.assign(n, 0);
        count.assign(n, 1);
        total = 0;
        // invariant: at update time, total must equal the sum of counts.
        // Counts start at 1 each (sum = n), so the first update adds n;
        // thereafter each tally adds 1 and updates fire every
        // update_cycle tallies, keeping the invariant.
        update_cycle = n;
        until_update = 0;
        update();
        update_cycle = (n + 6) >> 1;
        until_update = update_cycle;
    }
    void update() {
        total += update_cycle;
        if (total > DM_MAX_COUNT) {
            total = 0;
            for (u32 k = 0; k < nsym; k++) {
                count[k] = (count[k] + 1) >> 1;
                total += count[k];
            }
        }
        u32 sum = 0, scale = 0x80000000u / total;
        for (u32 k = 0; k < nsym; k++) {
            dist[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
            sum += count[k];
        }
        update_cycle = (5 * update_cycle) >> 2;
        u32 maxc = (nsym + 6) << 3;
        if (update_cycle > maxc) update_cycle = maxc;
        until_update = update_cycle;
    }
    inline void tally(u32 sym) {
        count[sym]++;
        if (--until_update == 0) update();
    }
};

struct Encoder {
    std::vector<u8> out;
    u32 base = 0, length = 0xFFFFFFFFu;

    inline void propagate_carry() {
        // increment the last non-0xFF byte, rolling 0xFFs to 0
        size_t i = out.size();
        while (i > 0) {
            if (out[i - 1] != 0xFFu) { out[i - 1]++; return; }
            out[i - 1] = 0;
            i--;
        }
    }
    inline void renorm() {
        while (length < AC_MIN_LENGTH) {
            out.push_back((u8)(base >> 24));
            base <<= 8;
            length <<= 8;
        }
    }
    void encode(Model &m, u32 sym) {
        u32 x, init_base = base;
        if (sym + 1 == m.nsym) {
            x = m.dist[sym] * (length >> DM_LENGTH_SHIFT);
            base += x;
            length -= x;
        } else {
            x = m.dist[sym] * (length >>= DM_LENGTH_SHIFT);
            base += x;
            length = m.dist[sym + 1] * length - x;
        }
        if (init_base > base) propagate_carry();
        renorm();
        m.tally(sym);
    }
    void write_bits(u32 bits, u32 value) {
        // raw equiprobable bits through the range coder
        while (bits > 16) { write_bits(16, value & 0xFFFFu); value >>= 16; bits -= 16; }
        u32 init_base = base;
        base += value * (length >>= bits);
        if (init_base > base) propagate_carry();
        renorm();
    }
    void done() {
        // flush the full low end of the interval: the decoder primes its
        // value with exactly these 4 bytes, which lies in [base, base+len)
        out.push_back((u8)(base >> 24));
        out.push_back((u8)(base >> 16));
        out.push_back((u8)(base >> 8));
        out.push_back((u8)base);
        // padding for decoder renorm read-ahead
        out.push_back(0); out.push_back(0); out.push_back(0);
    }
};

struct Decoder {
    const u8 *in; u64 pos, size;
    u32 value = 0, length = 0xFFFFFFFFu;

    void init(const u8 *data, u64 n) {
        in = data; pos = 0; size = n;
        value = 0;
        for (int i = 0; i < 4; i++) value = (value << 8) | byte();
        length = 0xFFFFFFFFu;
    }
    inline u8 byte() { return pos < size ? in[pos++] : 0; }
    inline void renorm() {
        while (length < AC_MIN_LENGTH) {
            value = (value << 8) | byte();
            length <<= 8;
        }
    }
    u32 decode(Model &m) {
        u32 y = length;
        length >>= DM_LENGTH_SHIFT;
        // binary search: largest s with dist[s]*length <= value
        u32 lo = 0, hi = m.nsym;  // dist[0] == 0 always
        while (hi - lo > 1) {
            u32 mid = (lo + hi) >> 1;
            if (m.dist[mid] * length <= value) lo = mid; else hi = mid;
        }
        u32 x = m.dist[lo] * length;
        value -= x;
        length = (lo + 1 == m.nsym) ? y - x : m.dist[lo + 1] * length - x;
        renorm();
        m.tally(lo);
        return lo;
    }
    u32 read_bits(u32 bits) {
        if (bits > 16) {
            u32 lo16 = read_bits(16);
            return lo16 | (read_bits(bits - 16) << 16);
        }
        u32 v = value / (length >>= bits);
        value -= v * length;
        renorm();
        return v < (1u << bits) ? v : (1u << bits) - 1;
    }
};

// ---------------------------------------------------------------------------
// Integer compressor: zigzag corrector, k-bit length model + low-bit models
// ---------------------------------------------------------------------------

static inline u32 zigzag(i32 v) { return ((u32)v << 1) ^ (u32)(v >> 31); }
static inline i32 unzigzag(u32 u) { return (i32)(u >> 1) ^ -(i32)(u & 1); }
static inline u32 bit_length(u32 v) {
    u32 n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

struct IntComp {
    std::vector<Model> k_model;   // per context: symbol = k (0..32)
    Model low[33];                // per k: low-bit model (<= 8 bits)
    u32 last_k = 0;

    void init(u32 contexts) {
        k_model.resize(contexts);
        for (auto &m : k_model) m.init(33);
        for (u32 k = 1; k <= 32; k++) {
            u32 nb = (k - 1 < 8) ? (k - 1) : 8;
            low[k].init(1u << nb);
        }
    }
    void compress(Encoder &enc, i32 pred, i32 real, u32 ctx) {
        u32 u = zigzag((i32)((u32)real - (u32)pred));
        u32 k = bit_length(u);
        last_k = k;
        enc.encode(k_model[ctx], k);
        if (k == 0) return;
        u32 rem = u - (1u << (k - 1));     // k-1 significant bits
        u32 nb = (k - 1 < 8) ? (k - 1) : 8;
        if (k - 1 <= 8) {
            if (nb) enc.encode(low[k], rem);
        } else {
            enc.encode(low[k], rem & 0xFFu);
            enc.write_bits(k - 9, rem >> 8);
        }
    }
    i32 decompress(Decoder &dec, i32 pred, u32 ctx) {
        u32 k = dec.decode(k_model[ctx]);
        last_k = k;
        if (k == 0) return pred;
        u32 nb = (k - 1 < 8) ? (k - 1) : 8;
        u32 rem = 0;
        if (k - 1 <= 8) {
            if (nb) rem = dec.decode(low[k]);
        } else {
            rem = dec.decode(low[k]);
            rem |= dec.read_bits(k - 9) << 8;
        }
        u32 u = (1u << (k - 1)) + rem;
        return (i32)((u32)pred + (u32)unzigzag(u));
    }
};

// ---------------------------------------------------------------------------
// Streaming median of 5 (x/y diff prediction, per return-map context)
// ---------------------------------------------------------------------------

struct Median5 {
    i32 v[5] = {0, 0, 0, 0, 0};
    bool high = true;
    i32 get() const {
        // median of the 5 values
        i32 a[5]; memcpy(a, v, sizeof(a));
        for (int i = 0; i < 4; i++)
            for (int j = i + 1; j < 5; j++)
                if (a[j] < a[i]) { i32 t = a[i]; a[i] = a[j]; a[j] = t; }
        return a[2];
    }
    void add(i32 d) {
        v[0] = v[1]; v[1] = v[2]; v[2] = v[3]; v[3] = v[4]; v[4] = d;
        (void)high;
    }
};

// ---------------------------------------------------------------------------
// POINT10 item (20 bytes): x,y,z i32; intensity u16; flags u8;
// classification u8; scan_angle_rank i8; user_data u8; point_source u16
// ---------------------------------------------------------------------------

struct Point10 {
    i32 x, y, z;
    u16 intensity;
    u8 flags, classification;
    i8 scan_angle;
    u8 user_data;
    u16 point_source;

    void from_bytes(const u8 *p) {
        memcpy(&x, p, 4); memcpy(&y, p + 4, 4); memcpy(&z, p + 8, 4);
        memcpy(&intensity, p + 12, 2);
        flags = p[14]; classification = p[15];
        scan_angle = (i8)p[16]; user_data = p[17];
        memcpy(&point_source, p + 18, 2);
    }
    void to_bytes(u8 *p) const {
        memcpy(p, &x, 4); memcpy(p + 4, &y, 4); memcpy(p + 8, &z, 4);
        memcpy(p + 12, &intensity, 2);
        p[14] = flags; p[15] = classification;
        p[16] = (u8)scan_angle; p[17] = user_data;
        memcpy(p + 18, &point_source, 2);
    }
};

struct Point10Codec {
    Point10 last;
    Median5 med_x[16], med_y[16];
    i32 last_height[8] = {0};
    u16 last_intensity[16] = {0};
    Model changed;                 // 6 change bits -> 64 symbols
    Model m_flags, m_class, m_scan, m_user;
    IntComp ic_x, ic_y, ic_z, ic_intensity, ic_source;

    void init(const Point10 &first) {
        last = first;
        for (int i = 0; i < 8; i++) last_height[i] = first.z;
        for (int i = 0; i < 16; i++) last_intensity[i] = first.intensity;
        changed.init(64);
        m_flags.init(256);
        m_class.init(256);
        m_scan.init(256);
        m_user.init(256);
        ic_x.init(2);
        ic_y.init(22);
        ic_z.init(20);
        ic_intensity.init(4);
        ic_source.init(1);
    }
    static inline u32 ret_num(u8 flags) { return flags & 7u; }
    static inline u32 num_rets(u8 flags) { return (flags >> 3) & 7u; }
    static inline u32 ctx_m(u8 flags) {  // 16 return-map contexts
        u32 n = num_rets(flags), r = ret_num(flags);
        return (n < 3 ? n : 3) * 4 + (r < 3 ? r : 3);
    }
    static inline u32 ctx_l(u8 flags) {  // 8 return-level contexts
        i32 d = (i32)num_rets(flags) - (i32)ret_num(flags);
        if (d < 0) d = -d;
        return d < 7 ? (u32)d : 7u;
    }

    void encode(Encoder &enc, const Point10 &p) {
        u32 ch = ((p.flags != last.flags) << 5)
               | ((p.intensity != last.intensity) << 4)
               | ((p.classification != last.classification) << 3)
               | ((p.scan_angle != last.scan_angle) << 2)
               | ((p.user_data != last.user_data) << 1)
               | (p.point_source != last.point_source);
        enc.encode(changed, ch);
        if (ch & 32) enc.encode(m_flags, p.flags);
        u32 m = ctx_m(p.flags);
        if (ch & 16)
            ic_intensity.compress(enc, (i32)last_intensity[m],
                                  (i32)p.intensity, m < 3 ? m : 3);
        if (ch & 8) enc.encode(m_class, p.classification);
        if (ch & 4) enc.encode(m_scan, (u8)(p.scan_angle - last.scan_angle));
        if (ch & 2) enc.encode(m_user, p.user_data);
        if (ch & 1)
            ic_source.compress(enc, (i32)last.point_source,
                               (i32)p.point_source, 0);

        bool single = num_rets(p.flags) == 1;
        i32 dx = (i32)((u32)p.x - (u32)last.x);
        ic_x.compress(enc, med_x[m].get(), dx, single ? 1 : 0);
        med_x[m].add(dx);
        u32 kx = ic_x.last_k;
        i32 dy = (i32)((u32)p.y - (u32)last.y);
        u32 cy = (single ? 11u : 0u) + (kx / 2 < 10 ? kx / 2 : 10);
        ic_y.compress(enc, med_y[m].get(), dy, cy);
        med_y[m].add(dy);
        u32 ky = ic_y.last_k;
        u32 l = ctx_l(p.flags);
        u32 cz = (single ? 10u : 0u) + (ky / 2 < 9 ? ky / 2 : 9);
        ic_z.compress(enc, last_height[l], p.z, cz);
        last_height[l] = p.z;
        last_intensity[m] = p.intensity;
        last = p;
    }
    void decode(Decoder &dec, Point10 &p) {
        p = last;
        u32 ch = dec.decode(changed);
        if (ch & 32) p.flags = (u8)dec.decode(m_flags);
        u32 m = ctx_m(p.flags);
        if (ch & 16)
            p.intensity = (u16)ic_intensity.decompress(
                dec, (i32)last_intensity[m], m < 3 ? m : 3);
        if (ch & 8) p.classification = (u8)dec.decode(m_class);
        if (ch & 4) p.scan_angle = (i8)(last.scan_angle + (i8)dec.decode(m_scan));
        if (ch & 2) p.user_data = (u8)dec.decode(m_user);
        if (ch & 1)
            p.point_source = (u16)ic_source.decompress(
                dec, (i32)last.point_source, 0);

        bool single = num_rets(p.flags) == 1;
        // decompress returns pred+corrector; pred was the diff median, so
        // the result is the x diff itself
        i32 dx = ic_x.decompress(dec, med_x[m].get(), single ? 1 : 0);
        p.x = (i32)((u32)last.x + (u32)dx);
        med_x[m].add(dx);
        u32 kx = ic_x.last_k;
        u32 cy = (single ? 11u : 0u) + (kx / 2 < 10 ? kx / 2 : 10);
        i32 dy = ic_y.decompress(dec, med_y[m].get(), cy);
        p.y = (i32)((u32)last.y + (u32)dy);
        med_y[m].add(dy);
        u32 ky = ic_y.last_k;
        u32 l = ctx_l(p.flags);
        u32 cz = (single ? 10u : 0u) + (ky / 2 < 9 ? ky / 2 : 9);
        p.z = ic_z.decompress(dec, last_height[l], cz);
        last_height[l] = p.z;
        last_intensity[m] = p.intensity;
        last = p;
    }
};

// ---------------------------------------------------------------------------
// GPSTIME item (8 bytes, f64 read as u64/i64)
// ---------------------------------------------------------------------------

struct GpsTimeCodec {
    i64 last = 0;
    i64 last_diff = 0;
    Model multi;            // 0..514: 512=zero-diff, 513=full, 514=first-diff
    IntComp ic_res;

    static const u32 MULTI_MAX = 510;
    static const u32 SYM_ZERO = 511;
    static const u32 SYM_FULL = 512;
    static const u32 SYM_DIFF = 513;

    void init(i64 first) {
        last = first;
        last_diff = 0;
        multi.init(514);
        ic_res.init(2);
    }
    void encode(Encoder &enc, i64 t) {
        i64 diff = (i64)((u64)t - (u64)last);
        if (diff == 0) {
            enc.encode(multi, SYM_ZERO);
            return;
        }
        if (last_diff != 0) {
            double m = (double)diff / (double)last_diff;
            i64 mi = (i64)(m + (m >= 0 ? 0.5 : -0.5));
            if (mi >= 1 && mi <= (i64)MULTI_MAX) {
                i64 res = diff - mi * last_diff;
                if (res >= -(i64)0x40000000 && res <= (i64)0x40000000) {
                    enc.encode(multi, (u32)(mi - 1));
                    ic_res.compress(enc, 0, (i32)res, mi == 1 ? 0 : 1);
                    last = t;
                    last_diff = diff;
                    return;
                }
            }
        } else if (diff >= -(i64)0x40000000 && diff <= (i64)0x40000000) {
            enc.encode(multi, SYM_DIFF);
            ic_res.compress(enc, 0, (i32)diff, 0);
            last = t;
            last_diff = diff;
            return;
        }
        enc.encode(multi, SYM_FULL);
        enc.write_bits(32, (u32)((u64)t & 0xFFFFFFFFu));
        enc.write_bits(32, (u32)((u64)t >> 32));
        last = t;
        last_diff = diff;
    }
    i64 decode(Decoder &dec) {
        u32 sym = dec.decode(multi);
        if (sym == SYM_ZERO) return last;
        i64 t;
        if (sym == SYM_FULL) {
            u64 lo = dec.read_bits(32);
            u64 hi = dec.read_bits(32);
            t = (i64)(lo | (hi << 32));
        } else if (sym == SYM_DIFF) {
            i64 diff = (i64)ic_res.decompress(dec, 0, 0);
            t = (i64)((u64)last + (u64)diff);
        } else {
            i64 mi = (i64)sym + 1;
            i64 res = (i64)ic_res.decompress(dec, 0, mi == 1 ? 0 : 1);
            t = (i64)((u64)last + (u64)(mi * last_diff + res));
        }
        last_diff = (i64)((u64)t - (u64)last);
        last = t;
        return t;
    }
};

// ---------------------------------------------------------------------------
// RGB item (6 bytes: r, g, b u16)
// ---------------------------------------------------------------------------

struct RgbCodec {
    u16 last[3] = {0, 0, 0};
    Model used;             // 6 bits: low/high byte changed per channel
    Model diff_lo[3], diff_hi[3];

    void init(const u16 *first) {
        memcpy(last, first, 6);
        used.init(64);
        for (int c = 0; c < 3; c++) { diff_lo[c].init(256); diff_hi[c].init(256); }
    }
    void encode(Encoder &enc, const u16 *rgb) {
        u32 u = 0;
        for (int c = 0; c < 3; c++) {
            if ((rgb[c] & 0xFF) != (last[c] & 0xFF)) u |= 1u << (2 * c);
            if ((rgb[c] >> 8) != (last[c] >> 8)) u |= 1u << (2 * c + 1);
        }
        enc.encode(used, u);
        for (int c = 0; c < 3; c++) {
            if (u & (1u << (2 * c)))
                enc.encode(diff_lo[c], (u8)((rgb[c] & 0xFF) - (last[c] & 0xFF)));
            if (u & (1u << (2 * c + 1)))
                enc.encode(diff_hi[c], (u8)((rgb[c] >> 8) - (last[c] >> 8)));
        }
        memcpy(last, rgb, 6);
    }
    void decode(Decoder &dec, u16 *rgb) {
        u32 u = dec.decode(used);
        for (int c = 0; c < 3; c++) {
            u8 lo = last[c] & 0xFF, hi = last[c] >> 8;
            if (u & (1u << (2 * c))) lo = (u8)(lo + dec.decode(diff_lo[c]));
            if (u & (1u << (2 * c + 1))) hi = (u8)(hi + dec.decode(diff_hi[c]));
            rgb[c] = (u16)lo | ((u16)hi << 8);
        }
        memcpy(last, rgb, 6);
    }
};

// ---------------------------------------------------------------------------
// Record codec for point formats 0-3
// ---------------------------------------------------------------------------

struct RecordCodec {
    u8 fmt;
    u32 size;
    Point10Codec p10;
    GpsTimeCodec gps;
    RgbCodec rgb;

    static u32 record_size(u8 fmt) {
        switch (fmt) {
            case 0: return 20;
            case 1: return 28;
            case 2: return 26;
            case 3: return 34;
        }
        return 0;
    }
    void init(u8 f, const u8 *first) {
        fmt = f;
        size = record_size(f);
        Point10 p;
        p.from_bytes(first);
        p10.init(p);
        const u8 *q = first + 20;
        if (fmt == 1 || fmt == 3) {
            i64 t;
            memcpy(&t, q, 8);
            gps.init(t);
            q += 8;
        }
        if (fmt == 2 || fmt == 3) {
            u16 c[3];
            memcpy(c, q, 6);
            rgb.init(c);
        }
    }
    void encode(Encoder &enc, const u8 *rec) {
        Point10 p;
        p.from_bytes(rec);
        p10.encode(enc, p);
        const u8 *q = rec + 20;
        if (fmt == 1 || fmt == 3) {
            i64 t;
            memcpy(&t, q, 8);
            gps.encode(enc, t);
            q += 8;
        }
        if (fmt == 2 || fmt == 3) {
            u16 c[3];
            memcpy(c, q, 6);
            rgb.encode(enc, c);
        }
    }
    void decode(Decoder &dec, u8 *rec) {
        Point10 p;
        p10.decode(dec, p);
        p.to_bytes(rec);
        u8 *q = rec + 20;
        if (fmt == 1 || fmt == 3) {
            i64 t = gps.decode(dec);
            memcpy(q, &t, 8);
            q += 8;
        }
        if (fmt == 2 || fmt == 3) {
            u16 c[3];
            rgb.decode(dec, c);
            memcpy(q, c, 6);
        }
    }
};

// ---------------------------------------------------------------------------
// CRC32 (poly 0xEDB88320) for fail-closed chunk integrity
// ---------------------------------------------------------------------------

static u32 crc32_of(const u8 *data, u64 n) {
    static u32 table[256];
    static bool init_done = false;
    if (!init_done) {
        for (u32 i = 0; i < 256; i++) {
            u32 c = i;
            for (int k = 0; k < 8; k++)
                c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
            table[i] = c;
        }
        init_done = true;
    }
    u32 c = 0xFFFFFFFFu;
    for (u64 i = 0; i < n; i++) c = table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

// Compress n_points records of format fmt into out (capacity cap).
// Returns bytes written; 0 on failure; negative needed-size if cap small.
long long f3dlaz_compress(const u8 *records, u32 n_points, u8 fmt,
                          u32 chunk_size, u8 *out, long long cap) {
    u32 rsize = RecordCodec::record_size(fmt);
    if (!records || rsize == 0 || n_points == 0 || chunk_size == 0) return 0;

    std::vector<u8> stream;
    std::vector<u32> chunk_bytes;
    u32 done_pts = 0;
    while (done_pts < n_points) {
        u32 n = n_points - done_pts;
        if (n > chunk_size) n = chunk_size;
        const u8 *base = records + (u64)done_pts * rsize;
        size_t start = stream.size();
        // first point raw
        stream.insert(stream.end(), base, base + rsize);
        RecordCodec rc;
        rc.init(fmt, base);
        Encoder enc;
        for (u32 i = 1; i < n; i++) rc.encode(enc, base + (u64)i * rsize);
        enc.done();
        stream.insert(stream.end(), enc.out.begin(), enc.out.end());
        chunk_bytes.push_back((u32)(stream.size() - start));
        done_pts += n;
    }
    // chunk table: magic, count, then per chunk {size, crc32}
    const u32 magic = 0x54433346u;  // 'F3CT'
    u32 nc = (u32)chunk_bytes.size();
    size_t table = 8 + 8ull * nc;
    long long total = (long long)(stream.size() + table);
    if (total > cap) return -total;
    memcpy(out, stream.data(), stream.size());
    u8 *t = out + stream.size();
    memcpy(t, &magic, 4);
    memcpy(t + 4, &nc, 4);
    u64 off2 = 0;
    for (u32 i = 0; i < nc; i++) {
        u32 crc = crc32_of(stream.data() + off2, chunk_bytes[i]);
        memcpy(t + 8 + 8ull * i, &chunk_bytes[i], 4);
        memcpy(t + 12 + 8ull * i, &crc, 4);
        off2 += chunk_bytes[i];
    }
    return total;
}

// Decompress a stream produced by f3dlaz_compress (or an equivalent layout
// with a trailing 'F3CT' chunk table). Returns n_points on success, 0 on
// failure (fail-closed: any structural inconsistency refuses to decode).
long long f3dlaz_decompress(const u8 *stream, long long stream_len,
                            u32 n_points, u8 fmt, u32 chunk_size,
                            u8 *out_records) {
    u32 rsize = RecordCodec::record_size(fmt);
    if (!stream || rsize == 0 || n_points == 0 || chunk_size == 0) return 0;
    if (stream_len < 8) return 0;
    // locate the chunk table: scan back — table = magic + count + sizes
    // (the caller knows the stream extent, the table is at the end)
    u32 nc_expect = (n_points + chunk_size - 1) / chunk_size;
    long long table_pos = stream_len - (8 + 8ll * nc_expect);
    if (table_pos < 0) return 0;
    u32 magic, nc;
    memcpy(&magic, stream + table_pos, 4);
    memcpy(&nc, stream + table_pos + 4, 4);
    if (magic != 0x54433346u || nc != nc_expect) return 0;
    std::vector<u32> chunk_bytes(nc), chunk_crc(nc);
    for (u32 i = 0; i < nc; i++) {
        memcpy(&chunk_bytes[i], stream + table_pos + 8 + 8ull * i, 4);
        memcpy(&chunk_crc[i], stream + table_pos + 12 + 8ull * i, 4);
    }

    u64 off = 0;
    u32 done_pts = 0;
    for (u32 c = 0; c < nc; c++) {
        u32 n = n_points - done_pts;
        if (n > chunk_size) n = chunk_size;
        if (off + chunk_bytes[c] > (u64)table_pos) return 0;
        if (chunk_bytes[c] < rsize) return 0;
        const u8 *base = stream + off;
        if (crc32_of(base, chunk_bytes[c]) != chunk_crc[c]) return 0;
        u8 *dst = out_records + (u64)done_pts * rsize;
        memcpy(dst, base, rsize);  // raw first point
        RecordCodec rc;
        rc.init(fmt, dst);
        Decoder dec;
        dec.init(base + rsize, chunk_bytes[c] - rsize);
        for (u32 i = 1; i < n; i++) rc.decode(dec, dst + (u64)i * rsize);
        off += chunk_bytes[c];
        done_pts += n;
    }
    return done_pts == n_points ? (long long)n_points : 0;
}

}  // extern "C"
