// Native WIN32 (NIED Hi-net) waveform decoder.
//
// The reference's Japan pipeline downloads Hi-net event data as win32
// archives and shells out to NIED's win32tools for conversion (reference
// volpick/data/data.py:897-1388, HinetPy win32 handling). This library
// decodes the format natively so the JapanDataset-equivalent path runs
// without external tooling. C ABI, consumed via ctypes
// (volpick_tpu/io/win32.py).
//
// Format (NIED WIN32 specification; clean-room implementation from the
// published structure):
//   file   := one-second block*
//   block  := BCD timestamp[8]  (YYYY MM DD HH MM SS, one BCD digit/nibble)
//             uint32 BE datasize (bytes of channel blocks that follow)
//             channel block*
//   chan   := uint16 BE organization/network id
//             uint16 BE channel id
//             uint16 BE: top nibble = sample size code, low 12 bits = n
//                        samples this second (== sampling rate in Hz)
//             int32  BE first sample
//             packed differences for the remaining n-1 samples:
//               code 0: 4-bit signed diffs, two per byte, high nibble first
//               code 1: 8-bit   code 2: 16-bit   code 3: 24-bit   code 4: 32-bit
//
// All reads are bounds-checked; the input is an untrusted file.
//
// Build: g++ -O2 -shared -fPIC -o _win32.so win32.cpp

#include <cstdint>
#include <cstring>

namespace {

inline uint16_t rd_u16(const uint8_t* p) { return (uint16_t)((p[0] << 8) | p[1]); }
inline uint32_t rd_u32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3];
}
inline int32_t rd_i32(const uint8_t* p) { return (int32_t)rd_u32(p); }

inline int bcd(uint8_t b) { return (b >> 4) * 10 + (b & 0x0F); }

inline bool is_leap(int y) { return (y % 4 == 0 && y % 100 != 0) || y % 400 == 0; }

// BCD timestamp → epoch seconds; returns false on invalid digits/fields.
bool bcd_time_to_epoch(const uint8_t* t, double* out) {
    for (int i = 0; i < 8; ++i)
        if ((t[i] >> 4) > 9 || (t[i] & 0x0F) > 9) return false;
    int year = bcd(t[0]) * 100 + bcd(t[1]);
    int mon = bcd(t[2]), day = bcd(t[3]);
    int hour = bcd(t[4]), min = bcd(t[5]), sec = bcd(t[6]);
    // t[7] reserved (0.01 s in some producers; Hi-net blocks are 1 s aligned)
    if (year < 1900 || year > 2200 || mon < 1 || mon > 12 || day < 1 || day > 31 ||
        hour > 23 || min > 59 || sec > 60)
        return false;
    static const int mdays[12] = {31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31};
    int64_t days = 0;
    for (int y = 1970; y < year; ++y) days += is_leap(y) ? 366 : 365;
    for (int m = 0; m < mon - 1; ++m) days += mdays[m] + (m == 1 && is_leap(year) ? 1 : 0);
    days += day - 1;
    *out = (double)(days * 86400LL + hour * 3600 + min * 60 + sec);
    return true;
}

// diff sizes in bytes per sample-size code; code 0 handled separately
inline int diff_bytes(int code) {
    switch (code) {
        case 1: return 1;
        case 2: return 2;
        case 3: return 3;
        case 4: return 4;
    }
    return -1;
}

inline int32_t sext24(uint32_t v) {
    v &= 0xFFFFFF;
    return (int32_t)((v ^ 0x800000) - 0x800000);
}

struct SecondInfo {
    uint16_t org_id;
    uint16_t chan_id;
    int32_t n_samples;   // decoded samples for this channel-second
    double starttime;    // epoch seconds
    int64_t offset;      // into the shared sample buffer
};

// Size in bytes of one channel block with n samples at size code `code`.
int64_t chan_block_bytes(int code, int n) {
    if (n < 1) return -1;
    if (code == 0) return 10 + (n - 1 + 1) / 2;  // two 4-bit diffs per byte
    int db = diff_bytes(code);
    if (db < 0) return -1;
    return 10 + (int64_t)(n - 1) * db;
}

}  // namespace

extern "C" {

// First pass: count channel-seconds and total samples. Returns 0 when at
// least one valid block was parsed, else -1. Parsing stops at the first
// corrupt block (same rule as the decode pass, so counts always agree).
int win32_scan(const uint8_t* buf, int64_t len, int64_t* n_chansec, int64_t* total_samples) {
    *n_chansec = 0;
    *total_samples = 0;
    int64_t pos = 0;
    int ok_blocks = 0;
    while (pos + 12 <= len) {
        double t;
        if (!bcd_time_to_epoch(buf + pos, &t)) break;
        uint32_t datasize = rd_u32(buf + pos + 8);
        int64_t dstart = pos + 12;
        if (dstart + (int64_t)datasize > len) break;  // truncated block
        int64_t p = dstart, dend = dstart + datasize;
        bool ok = true;
        while (p + 10 <= dend) {
            uint16_t sr_word = rd_u16(buf + p + 4);
            int code = sr_word >> 12, n = sr_word & 0x0FFF;
            int64_t nb = chan_block_bytes(code, n);
            if (nb < 0 || p + nb > dend) { ok = false; break; }
            *n_chansec += 1;
            *total_samples += n;
            p += nb;
        }
        if (!ok || p != dend) break;
        ok_blocks += 1;
        pos = dend;
    }
    return ok_blocks > 0 ? 0 : -1;
}

// Second pass: decode. `samples` holds total_samples doubles, `infos` holds
// n_chansec SecondInfo. Returns the number of channel-seconds decoded.
int64_t win32_decode(const uint8_t* buf, int64_t len, double* samples, SecondInfo* infos) {
    int64_t pos = 0, sample_off = 0, nrec = 0;
    while (pos + 12 <= len) {
        double t;
        if (!bcd_time_to_epoch(buf + pos, &t)) break;
        uint32_t datasize = rd_u32(buf + pos + 8);
        int64_t dstart = pos + 12;
        if (dstart + (int64_t)datasize > len) break;
        int64_t p = dstart, dend = dstart + datasize;
        bool ok = true;
        while (p + 10 <= dend) {
            uint16_t org = rd_u16(buf + p);
            uint16_t chan = rd_u16(buf + p + 2);
            uint16_t sr_word = rd_u16(buf + p + 4);
            int code = sr_word >> 12, n = sr_word & 0x0FFF;
            int64_t nb = chan_block_bytes(code, n);
            if (nb < 0 || p + nb > dend) { ok = false; break; }

            SecondInfo* info = &infos[nrec];
            info->org_id = org;
            info->chan_id = chan;
            info->starttime = t;
            info->offset = sample_off;
            info->n_samples = n;

            double* out = samples + sample_off;
            int32_t x = rd_i32(buf + p + 6);
            out[0] = (double)x;
            const uint8_t* d = buf + p + 10;
            if (code == 0) {
                for (int i = 1; i < n; ++i) {
                    uint8_t byte = d[(i - 1) / 2];
                    int nib = (i - 1) % 2 == 0 ? (byte >> 4) : (byte & 0x0F);
                    int32_t diff = (int32_t)((nib ^ 0x8) - 0x8);  // sign-extend 4 bits
                    x += diff;
                    out[i] = (double)x;
                }
            } else {
                int db = diff_bytes(code);
                for (int i = 1; i < n; ++i) {
                    const uint8_t* q = d + (int64_t)(i - 1) * db;
                    int32_t diff = 0;
                    switch (code) {
                        case 1: diff = (int8_t)q[0]; break;
                        case 2: diff = (int16_t)rd_u16(q); break;
                        case 3: diff = sext24(((uint32_t)q[0] << 16) | ((uint32_t)q[1] << 8) | q[2]); break;
                        case 4: diff = rd_i32(q); break;
                    }
                    x += diff;
                    out[i] = (double)x;
                }
            }
            sample_off += n;
            nrec += 1;
            p += nb;
        }
        if (!ok || p != dend) break;
        pos = dend;
    }
    return nrec;
}

}  // extern "C"
