// gamer_tpu native runtime — host-side hot paths in C++.
//
// The reference implements its whole runtime in C++ (Qt); the TPU compute
// path here is JAX/Pallas, and this library covers the host-side pieces
// that matter at production scale (dataset pipelines over thousands of
// scene files, large-frame exports, star-field splatting):
//
//   gx_parse / gx_write      .gax QDataStream codec
//                            (layout: galaxy.h operator<<, galaxyparams.h:31-36,
//                             componentparams.h:32-37 — big-endian f64,
//                             UTF-16BE length-prefixed strings)
//   fits_write_f64           standard FITS primary HDU (fitsio.h:18-56
//                            equivalent, without its byte-flip bug)
//   stars_splat              gaussian star-field overlay
//                            (buffer2d.cpp:140-173,224-243 semantics,
//                             seeded mt19937_64 instead of bare rand())
//
// C ABI only — consumed from Python via ctypes (gamer_tpu/native).
// Build: make -C native   ->  libgamer_native.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <algorithm>
#include <random>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// big-endian cursor (QDataStream compatible)
// ---------------------------------------------------------------------------

struct Reader {
    const uint8_t* p;
    size_t len;
    size_t pos = 0;
    bool ok = true;

    bool need(size_t n) {
        if (pos + n > len) { ok = false; return false; }
        return true;
    }
    uint32_t u32() {
        if (!need(4)) return 0;
        uint32_t v = (uint32_t(p[pos]) << 24) | (uint32_t(p[pos + 1]) << 16) |
                     (uint32_t(p[pos + 2]) << 8) | uint32_t(p[pos + 3]);
        pos += 4;
        return v;
    }
    int32_t i32() { return int32_t(u32()); }
    double f64() {
        if (!need(8)) return 0.0;
        uint64_t v = 0;
        for (int i = 0; i < 8; i++) v = (v << 8) | p[pos + i];
        pos += 8;
        double d;
        std::memcpy(&d, &v, 8);
        return d;
    }
    // QString: u32 byte length (0xFFFFFFFF = null), UTF-16BE payload -> UTF-8
    void qstring(char* out, size_t cap) {
        out[0] = 0;
        uint32_t n = u32();
        if (!ok || n == 0xFFFFFFFFu) return;
        if (n % 2 || !need(n)) { ok = false; return; }
        std::string s;
        for (uint32_t i = 0; i + 1 < n; i += 2) {
            uint32_t cu = (uint32_t(p[pos + i]) << 8) | p[pos + i + 1];
            uint32_t cp = cu;
            if (cu >= 0xD800 && cu <= 0xDBFF && i + 3 < n) {  // surrogate pair
                uint32_t lo = (uint32_t(p[pos + i + 2]) << 8) | p[pos + i + 3];
                if (lo >= 0xDC00 && lo <= 0xDFFF) {
                    cp = 0x10000 + ((cu - 0xD800) << 10) + (lo - 0xDC00);
                    i += 2;
                }
            }
            if (cp < 0x80) s += char(cp);
            else if (cp < 0x800) {
                s += char(0xC0 | (cp >> 6));
                s += char(0x80 | (cp & 0x3F));
            } else if (cp < 0x10000) {
                s += char(0xE0 | (cp >> 12));
                s += char(0x80 | ((cp >> 6) & 0x3F));
                s += char(0x80 | (cp & 0x3F));
            } else {
                s += char(0xF0 | (cp >> 18));
                s += char(0x80 | ((cp >> 12) & 0x3F));
                s += char(0x80 | ((cp >> 6) & 0x3F));
                s += char(0x80 | (cp & 0x3F));
            }
        }
        pos += n;
        std::snprintf(out, cap, "%s", s.c_str());
    }
};

struct Writer {
    std::vector<uint8_t> buf;

    void u32(uint32_t v) {
        buf.push_back(uint8_t(v >> 24));
        buf.push_back(uint8_t(v >> 16));
        buf.push_back(uint8_t(v >> 8));
        buf.push_back(uint8_t(v));
    }
    void i32(int32_t v) { u32(uint32_t(v)); }
    void f64(double d) {
        uint64_t v;
        std::memcpy(&v, &d, 8);
        for (int i = 7; i >= 0; i--) buf.push_back(uint8_t(v >> (8 * i)));
    }
    // UTF-8 -> UTF-16BE QString
    void qstring(const char* s) {
        std::vector<uint16_t> units;
        const unsigned char* c = reinterpret_cast<const unsigned char*>(s);
        while (*c) {
            uint32_t cp = 0;
            if (*c < 0x80) cp = *c++;
            else if ((*c >> 5) == 6) { cp = (*c++ & 0x1F) << 6; cp |= *c++ & 0x3F; }
            else if ((*c >> 4) == 14) {
                cp = (*c++ & 0x0F) << 12; cp |= (*c++ & 0x3F) << 6; cp |= *c++ & 0x3F;
            } else {
                cp = (*c++ & 0x07) << 18; cp |= (*c++ & 0x3F) << 12;
                cp |= (*c++ & 0x3F) << 6; cp |= *c++ & 0x3F;
            }
            if (cp >= 0x10000) {
                cp -= 0x10000;
                units.push_back(uint16_t(0xD800 + (cp >> 10)));
                units.push_back(uint16_t(0xDC00 + (cp & 0x3FF)));
            } else {
                units.push_back(uint16_t(cp));
            }
        }
        u32(uint32_t(units.size() * 2));
        for (uint16_t u : units) {
            buf.push_back(uint8_t(u >> 8));
            buf.push_back(uint8_t(u));
        }
    }
};

}  // namespace

// ---------------------------------------------------------------------------
// .gax codec
// ---------------------------------------------------------------------------

extern "C" {

constexpr int GX_MAX_COMPS = 64;
constexpr int GX_NFIELDS = 13;  // strength, arm, z0, r0, active, delta,
                                // winding, scale, noise_offset, noise_tilt,
                                // ks, inner, (spare)

struct GxGalaxy {
    char display_name[128];
    char galaxy_name[128];
    double axis[3];
    double bulge_dust;
    double bulge_axis[3];
    double winding_b, winding_n, no_arms;
    double arm[4];
    double inner_twirl, warp_amplitude, warp_scale;
    int32_t n_comps;
    double fields[GX_MAX_COMPS][GX_NFIELDS];
    char class_name[GX_MAX_COMPS][32];
    char spectrum[GX_MAX_COMPS][32];
    char comp_name[GX_MAX_COMPS][64];
};

// returns 0 on success, nonzero error code
int gx_parse(const uint8_t* data, long len, GxGalaxy* out) {
    Reader r{data, size_t(len)};
    std::memset(out, 0, sizeof(*out));
    r.qstring(out->display_name, sizeof(out->display_name));
    r.qstring(out->galaxy_name, sizeof(out->galaxy_name));
    for (int i = 0; i < 3; i++) out->axis[i] = r.f64();
    out->bulge_dust = r.f64();
    for (int i = 0; i < 3; i++) out->bulge_axis[i] = r.f64();
    out->winding_b = r.f64();
    out->winding_n = r.f64();
    out->no_arms = r.f64();
    for (int i = 0; i < 4; i++) out->arm[i] = r.f64();
    out->inner_twirl = r.f64();
    out->warp_amplitude = r.f64();
    out->warp_scale = r.f64();
    int32_t n = r.i32();
    if (!r.ok) return 1;
    if (n < 0 || n > GX_MAX_COMPS) return 2;
    out->n_comps = n;
    for (int c = 0; c < n; c++) {
        double* f = out->fields[c];
        r.qstring(out->class_name[c], 32);
        f[0] = r.f64();                       // strength
        r.qstring(out->spectrum[c], 32);
        f[1] = r.f64();                       // arm
        f[2] = r.f64();                       // z0
        f[3] = r.f64();                       // r0
        f[4] = r.f64();                       // active
        f[5] = r.f64();                       // delta
        f[6] = r.f64();                       // winding
        f[7] = r.f64();                       // scale
        f[8] = r.f64();                       // noise_offset
        f[9] = r.f64();                       // noise_tilt
        f[10] = r.f64();                      // ks
        f[11] = r.f64();                      // inner
        r.qstring(out->comp_name[c], 64);
    }
    return r.ok ? 0 : 1;
}

// serializes into caller buffer; returns bytes written or -1 if cap too small
long gx_write(const GxGalaxy* g, uint8_t* dst, long cap) {
    Writer w;
    w.qstring(g->display_name);
    w.qstring(g->galaxy_name);
    for (int i = 0; i < 3; i++) w.f64(g->axis[i]);
    w.f64(g->bulge_dust);
    for (int i = 0; i < 3; i++) w.f64(g->bulge_axis[i]);
    w.f64(g->winding_b);
    w.f64(g->winding_n);
    w.f64(g->no_arms);
    for (int i = 0; i < 4; i++) w.f64(g->arm[i]);
    w.f64(g->inner_twirl);
    w.f64(g->warp_amplitude);
    w.f64(g->warp_scale);
    w.i32(g->n_comps);
    for (int c = 0; c < g->n_comps; c++) {
        const double* f = g->fields[c];
        w.qstring(g->class_name[c]);
        w.f64(f[0]);
        w.qstring(g->spectrum[c]);
        for (int k = 1; k <= 11; k++) w.f64(f[k]);
        w.qstring(g->comp_name[c]);
    }
    if (long(w.buf.size()) > cap) return -1;
    std::memcpy(dst, w.buf.data(), w.buf.size());
    return long(w.buf.size());
}

// ---------------------------------------------------------------------------
// FITS writer (standard big-endian f64 primary HDU, 2880-byte blocks)
// ---------------------------------------------------------------------------

static void fits_card(char* block, int idx, const char* key, const char* val) {
    char card[81];
    if (val && val[0])
        std::snprintf(card, sizeof(card), "%-8s= %20s", key, val);
    else
        std::snprintf(card, sizeof(card), "%s", key);
    std::memset(block + idx * 80, ' ', 80);
    std::memcpy(block + idx * 80, card, std::strlen(card));
}

int fits_write_f64(const char* path, const double* data, int w, int h) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    char header[2880];
    std::memset(header, ' ', sizeof(header));
    char num[32];
    fits_card(header, 0, "SIMPLE", "T");
    fits_card(header, 1, "BITPIX", "-64");
    fits_card(header, 2, "NAXIS", "2");
    std::snprintf(num, sizeof(num), "%d", w);
    fits_card(header, 3, "NAXIS1", num);
    std::snprintf(num, sizeof(num), "%d", h);
    fits_card(header, 4, "NAXIS2", num);
    fits_card(header, 5, "END", "");
    std::fwrite(header, 1, sizeof(header), f);

    // row-flipped, big-endian (matches gamer_tpu.io.fits byte-for-byte)
    std::vector<uint8_t> row(size_t(w) * 8);
    for (int y = h - 1; y >= 0; y--) {
        const double* src = data + size_t(y) * w;
        for (int x = 0; x < w; x++) {
            uint64_t v;
            std::memcpy(&v, &src[x], 8);
            for (int b = 0; b < 8; b++)
                row[size_t(x) * 8 + b] = uint8_t(v >> (8 * (7 - b)));
        }
        std::fwrite(row.data(), 1, row.size(), f);
    }
    size_t written = size_t(w) * h * 8;
    size_t pad = (2880 - written % 2880) % 2880;
    if (pad) {
        std::vector<uint8_t> zeros(pad, 0);
        std::fwrite(zeros.data(), 1, pad, f);
    }
    std::fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// star-field splatter (buffer2d.cpp:140-173,224-243 semantics, seeded)
// ---------------------------------------------------------------------------

int stars_splat(float* buf /* size*size*3, row-major RGB */, int size,
                int n_stars, double base_size, double size_spread,
                double strength, uint64_t seed) {
    std::mt19937_64 gen(seed ? seed : 5489);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    std::normal_distribution<double> gauss;

    for (int s = 0; s < n_stars; s++) {
        int x = int(gen() % uint64_t(size));
        int y = int(gen() % uint64_t(size));
        double cx = std::min(uni(gen) + 0.6, 1.0);
        double cy = std::min(uni(gen) + 0.6, cx);
        double cz = std::min(uni(gen) + 0.6, 1.0);
        double sz = std::max(base_size + size_spread * gauss(gen), base_size / 3.0);
        int w = int(int(sz * size) / 245.0);
        double ss = sz * std::abs(strength + strength * gauss(gen));
        if (w < 2) continue;
        double cs[3] = {cx * ss, cy * ss, cz * ss};
        for (int dx = -w / 2; dx < w / 2; dx++) {
            for (int dy = -w / 2; dy < w / 2; dy++) {
                int xx = x + dx, yy = y + dy;
                if (xx < 0 || xx >= size || yy < 0 || yy >= size) continue;
                double fx = dx / double(w), fy = dy / double(w);
                double v = std::exp(-(fx * fx + fy * fy) / 0.01);
                float* px = buf + (size_t(yy) * size + xx) * 3;
                for (int ch = 0; ch < 3; ch++)
                    px[ch] = std::max(px[ch], float(v * cs[ch]));
            }
        }
    }
    return 0;
}

}  // extern "C"
