// Native miniSEED (SEED v2.4) record parser + Steim1/Steim2 decoder.
//
// The reference framework ingests event waveforms as miniSEED via obspy
// (reference volpick/data/convert.py:240 `read(mseed_dir / trace_name)`);
// this library provides that capability natively (obspy-free) for the
// TPU framework's data layer. C ABI, consumed from Python via ctypes
// (volpick_tpu/io/miniseed.py).
//
// Supported encodings: 1 (int16), 3 (int32), 4 (float32), 5 (float64),
// 10 (Steim1), 11 (Steim2). Byte order is taken from blockette 1000 when
// present, else big-endian (the SEED default).
//
// Build: g++ -O2 -shared -fPIC -o _miniseed.so miniseed.cpp

#include <cstdint>
#include <cstring>
#include <cstdio>

namespace {

inline uint16_t rd_u16(const uint8_t* p, bool big) {
    return big ? (uint16_t)((p[0] << 8) | p[1]) : (uint16_t)((p[1] << 8) | p[0]);
}
inline int16_t rd_i16(const uint8_t* p, bool big) { return (int16_t)rd_u16(p, big); }
inline uint32_t rd_u32(const uint8_t* p, bool big) {
    return big ? ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3]
               : ((uint32_t)p[3] << 24) | ((uint32_t)p[2] << 16) | ((uint32_t)p[1] << 8) | p[0];
}
inline int32_t rd_i32(const uint8_t* p, bool big) { return (int32_t)rd_u32(p, big); }
inline float rd_f32(const uint8_t* p, bool big) {
    uint32_t v = rd_u32(p, big);
    float f;
    std::memcpy(&f, &v, 4);
    return f;
}
inline double rd_f64(const uint8_t* p, bool big) {
    uint64_t v = big ? ((uint64_t)rd_u32(p, true) << 32) | rd_u32(p + 4, true)
                     : ((uint64_t)rd_u32(p + 4, false) << 32) | rd_u32(p, false);
    double d;
    std::memcpy(&d, &v, 8);
    return d;
}

// sign-extend the low `bits` bits of v
inline int32_t sext(uint32_t v, int bits) {
    uint32_t m = 1u << (bits - 1);
    v &= (1u << bits) - 1;
    return (int32_t)((v ^ m) - m);
}

// Decode Steim1/2 data section into diffs; returns sample count written.
int decode_steim(const uint8_t* data, int nbytes, bool big, int version,
                 int expected, double* out) {
    int produced = 0;
    int32_t x = 0;
    bool have_x0 = false;
    int nframes = nbytes / 64;
    int32_t diffs[128];
    for (int f = 0; f < nframes && produced < expected; ++f) {
        const uint8_t* frame = data + f * 64;
        uint32_t ctrl = rd_u32(frame, big);
        for (int w = 1; w < 16 && produced < expected; ++w) {
            int nib = (ctrl >> (2 * (15 - w))) & 0x3;
            const uint8_t* wp = frame + 4 * w;
            int nd = 0;
            if (f == 0 && w == 1) {
                // forward integration constant X0
                x = rd_i32(wp, big);
                have_x0 = true;
                continue;
            }
            if (f == 0 && w == 2) continue;  // reverse constant XN (unused)
            if (nib == 0) continue;
            if (nib == 1) {
                for (int k = 0; k < 4; ++k) diffs[nd++] = (int8_t)wp[k];
            } else if (version == 1) {
                if (nib == 2) {
                    diffs[nd++] = rd_i16(wp, big);
                    diffs[nd++] = rd_i16(wp + 2, big);
                } else {  // nib == 3
                    diffs[nd++] = rd_i32(wp, big);
                }
            } else {  // Steim2
                uint32_t v = rd_u32(wp, big);
                int dnib = (v >> 30) & 0x3;
                if (nib == 2) {
                    if (dnib == 1) diffs[nd++] = sext(v, 30);
                    else if (dnib == 2) { diffs[nd++] = sext(v >> 15, 15); diffs[nd++] = sext(v, 15); }
                    else if (dnib == 3) { for (int k = 2; k >= 0; --k) diffs[nd++] = sext(v >> (10 * k), 10); }
                } else {  // nib == 3
                    if (dnib == 0) { for (int k = 4; k >= 0; --k) diffs[nd++] = sext(v >> (6 * k), 6); }
                    else if (dnib == 1) { for (int k = 5; k >= 0; --k) diffs[nd++] = sext(v >> (5 * k), 5); }
                    else if (dnib == 2) { for (int k = 6; k >= 0; --k) diffs[nd++] = sext(v >> (4 * k), 4); }
                }
            }
            for (int k = 0; k < nd && produced < expected; ++k) {
                if (produced == 0 && have_x0) {
                    // first sample is X0 itself; the first diff is redundant
                    out[produced++] = (double)x;
                } else {
                    x += diffs[k];
                    out[produced++] = (double)x;
                }
            }
        }
    }
    return produced;
}

struct RecordInfo {
    char network[3];
    char station[6];
    char location[3];
    char channel[4];
    double starttime;   // epoch seconds UTC
    double sampling_rate;
    int32_t nsamples;   // decoded samples
    int64_t offset;     // offset into the shared sample buffer
};

inline bool is_leap(int y) { return (y % 4 == 0 && y % 100 != 0) || y % 400 == 0; }

double btime_to_epoch(int year, int doy, int hour, int minute, int sec, int frac_1e4) {
    // days since 1970-01-01
    int64_t days = 0;
    for (int y = 1970; y < year; ++y) days += is_leap(y) ? 366 : 365;
    days += doy - 1;
    return (double)(days * 86400LL + hour * 3600 + minute * 60 + sec) + frac_1e4 * 1e-4;
}

double rate_from_factors(int f, int m) {
    double r = 0.0;
    if (f > 0) r = (double)f;
    else if (f < 0) r = -1.0 / (double)f;
    if (m > 0) r *= (double)m;
    else if (m < 0) r /= -(double)m;
    return r;
}

// Parsed fixed-header + blockette-1000 fields, shared by both passes so the
// scan and decode passes always agree on record boundaries. All reads are
// bounds-checked against `avail` (bytes remaining in the buffer) — the input
// is untrusted file content arriving via ctypes.
struct Header {
    bool ok;            // plausible record header
    bool big;           // header byte order
    bool data_big;      // data byte order (blockette 1000)
    int encoding;
    int reclen;         // validated: power of two in [128, 65536]
    uint16_t nsamp;
    uint16_t data_off;  // 0 if the record carries no decodable data section
};

Header parse_header(const uint8_t* rec, int64_t avail) {
    Header h = {};
    h.ok = false;
    char q = (char)rec[6];
    if (!(q == 'D' || q == 'R' || q == 'Q' || q == 'M')) return h;
    // assume big-endian header first; verify year sanity to pick byte order
    h.big = true;
    {
        uint16_t yr = rd_u16(rec + 20, true);
        if (yr < 1900 || yr > 2500) h.big = false;
    }
    h.nsamp = rd_u16(rec + 30, h.big);
    h.data_off = rd_u16(rec + 44, h.big);
    uint16_t bkt_off = rd_u16(rec + 46, h.big);
    int nbkt = rec[39];
    h.encoding = 11;
    h.data_big = h.big;
    h.reclen = 0;
    uint16_t off = bkt_off;
    // blockette walk: every read below touches rec[off .. off+7], so require
    // the full 8 bytes in-buffer (blockette 1000 is 8 bytes long)
    for (int b = 0; b < nbkt && off >= 48 && (int64_t)off + 8 <= avail; ++b) {
        uint16_t btype = rd_u16(rec + off, h.big);
        uint16_t next = rd_u16(rec + off + 2, h.big);
        if (btype == 1000) {
            h.encoding = rec[off + 4];
            h.data_big = rec[off + 5] != 0;
            int exp = rec[off + 6];
            if (exp < 7 || exp > 16) return h;  // corrupt length → reject record
            h.reclen = 1 << exp;
            break;
        }
        if (next == 0 || next <= off) break;
        off = next;
    }
    if (h.reclen == 0) h.reclen = 512;  // common default when no blockette 1000
    // data section must start after the fixed header and inside the record;
    // a record with no data (data_off == 0) is legal (headers-only)
    if (h.data_off != 0 && (h.data_off < 48 || h.data_off >= h.reclen)) {
        h.data_off = 0;  // unusable data section: keep the record, decode nothing
    }
    h.ok = true;
    return h;
}

}  // namespace

extern "C" {

// First pass: count records and total samples. Returns 0 on success (at least
// one plausible record); parsing stops at the first corrupt record.
int msd_scan(const uint8_t* buf, int64_t len, int32_t* n_records, int64_t* total_samples) {
    *n_records = 0;
    *total_samples = 0;
    int64_t pos = 0;
    while (pos + 48 <= len) {
        Header h = parse_header(buf + pos, len - pos);
        if (!h.ok) break;
        *n_records += 1;
        *total_samples += h.nsamp;
        pos += h.reclen;
    }
    return *n_records > 0 ? 0 : -1;
}

// Second pass: decode all records. `samples` must hold total_samples doubles,
// `infos` must hold n_records RecordInfo. Returns number of records decoded.
int msd_decode(const uint8_t* buf, int64_t len, double* samples, RecordInfo* infos) {
    int64_t pos = 0;
    int64_t sample_off = 0;
    int nrec = 0;
    while (pos + 48 <= len) {
        const uint8_t* rec = buf + pos;
        Header h = parse_header(rec, len - pos);
        if (!h.ok) break;
        bool big = h.big;
        uint16_t nsamp = h.nsamp;
        int16_t rf = rd_i16(rec + 32, big);
        int16_t rm = rd_i16(rec + 34, big);
        uint16_t data_off = h.data_off;
        int reclen = h.reclen;
        int encoding = h.encoding;
        bool data_big = h.data_big;

        RecordInfo* info = &infos[nrec];
        std::memcpy(info->station, rec + 8, 5); info->station[5] = 0;
        std::memcpy(info->location, rec + 13, 2); info->location[2] = 0;
        std::memcpy(info->channel, rec + 15, 3); info->channel[3] = 0;
        std::memcpy(info->network, rec + 18, 2); info->network[2] = 0;
        info->starttime = btime_to_epoch(
            rd_u16(rec + 20, big), rd_u16(rec + 22, big), rec[24], rec[25], rec[26],
            rd_u16(rec + 28, big));
        info->sampling_rate = rate_from_factors(rf, rm);
        info->offset = sample_off;

        // clamp the data section to what is actually in the buffer: a
        // truncated final record must not read past `len`
        int64_t rec_avail = len - pos;
        int64_t rec_end = reclen < rec_avail ? reclen : rec_avail;
        const uint8_t* data = rec + data_off;
        int nbytes = data_off != 0 && rec_end > data_off ? (int)(rec_end - data_off) : 0;
        int produced = 0;
        double* out = samples + sample_off;
        if (nbytes == 0) encoding = -1;  // no decodable payload
        switch (encoding) {
            case 1:  // int16
                for (int i = 0; i < nsamp && 2 * i + 2 <= nbytes; ++i)
                    out[produced++] = (double)rd_i16(data + 2 * i, data_big);
                break;
            case 3:  // int32
                for (int i = 0; i < nsamp && 4 * i + 4 <= nbytes; ++i)
                    out[produced++] = (double)rd_i32(data + 4 * i, data_big);
                break;
            case 4:  // float32
                for (int i = 0; i < nsamp && 4 * i + 4 <= nbytes; ++i)
                    out[produced++] = (double)rd_f32(data + 4 * i, data_big);
                break;
            case 5:  // float64
                for (int i = 0; i < nsamp && 8 * i + 8 <= nbytes; ++i)
                    out[produced++] = rd_f64(data + 8 * i, data_big);
                break;
            case 10:
                produced = decode_steim(data, nbytes, data_big, 1, nsamp, out);
                break;
            case 11:
                produced = decode_steim(data, nbytes, data_big, 2, nsamp, out);
                break;
            default:
                produced = 0;  // unsupported encoding → empty record
        }
        info->nsamples = produced;
        sample_off += produced;
        nrec += 1;
        pos += reclen;
    }
    return nrec;
}

}  // extern "C"
