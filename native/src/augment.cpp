// Native augmentation core: single-pass HSV jitter on uint8 RGB.
//
// The training loader's dominant host cost (measured r3: the vectorized
// numpy HSV round-trip = ~127 ms per 640x640 image, ~15 full-image float
// temporaries). This kernel performs the SAME fp32 math per pixel in one
// pass with no allocation; xrseg_tpu/train/data.py dispatches here and
// falls back to the numpy implementation (kept as the parity oracle)
// when the native library is unavailable.
//
// Math mirrors data.hsv_jitter exactly (RGB -> HSV, gain, HSV -> RGB,
// round-half-up to uint8) so outputs are bit-identical up to fp32
// contraction differences; the parity test allows <=1 step on a vanishing
// fraction of pixels.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline void hsv_pixel(const uint8_t* src, uint8_t* dst,
                      float gh, float gs, float gv) {
    const float r = src[0] * (1.0f / 255.0f);
    const float g = src[1] * (1.0f / 255.0f);
    const float b = src[2] * (1.0f / 255.0f);
    float mx = r > g ? r : g; mx = mx > b ? mx : b;
    float mn = r < g ? r : g; mn = mn < b ? mn : b;
    const float c = mx - mn + 1e-12f;

    // hue branch order matches numpy's np.where(mx==r, ., np.where(mx==g,...))
    float hue;
    if (mx == r) {
        hue = std::fmod((g - b) / c, 6.0f);
        if (hue < 0.0f) hue += 6.0f;           // numpy % is non-negative
    } else if (mx == g) {
        hue = (b - r) / c + 2.0f;
    } else {
        hue = (r - g) / c + 4.0f;
    }
    hue *= (1.0f / 6.0f);

    float sat = mx > 0.0f ? c / (mx + 1e-12f) : 0.0f;
    hue = std::fmod(hue * gh, 1.0f);
    if (hue < 0.0f) hue += 1.0f;
    sat = sat * gs; sat = sat < 0.0f ? 0.0f : (sat > 1.0f ? 1.0f : sat);
    float val = mx * gv; val = val < 0.0f ? 0.0f : (val > 1.0f ? 1.0f : val);

    const float h6 = hue * 6.0f;
    int k = static_cast<int>(h6) % 6;          // h6 >= 0 here
    const float f = h6 - std::floor(h6);
    const float p = val * (1.0f - sat);
    const float q = val * (1.0f - f * sat);
    const float t = val * (1.0f - (1.0f - f) * sat);

    float o0, o1, o2;
    switch (k) {
        case 0: o0 = val; o1 = t;   o2 = p;   break;
        case 1: o0 = q;   o1 = val; o2 = p;   break;
        case 2: o0 = p;   o1 = val; o2 = t;   break;
        case 3: o0 = p;   o1 = q;   o2 = val; break;
        case 4: o0 = t;   o1 = p;   o2 = val; break;
        default: o0 = val; o1 = p;  o2 = q;   break;
    }
    dst[0] = static_cast<uint8_t>(o0 * 255.0f + 0.5f);
    dst[1] = static_cast<uint8_t>(o1 * 255.0f + 0.5f);
    dst[2] = static_cast<uint8_t>(o2 * 255.0f + 0.5f);
}

void hsv_range(const uint8_t* src, uint8_t* dst, int64_t begin, int64_t end,
               float gh, float gs, float gv) {
    for (int64_t i = begin; i < end; ++i)
        hsv_pixel(src + 3 * i, dst + 3 * i, gh, gs, gv);
}

}  // namespace

extern "C" {

// src/dst: [n_pixels, 3] uint8 RGB (may alias). gains as in
// data.hsv_jitter (multiplicative on h/s/v). n_threads <= 0 = hardware.
int xrseg_hsv_jitter(const uint8_t* src, uint8_t* dst, int64_t n_pixels,
                     float gh, float gs, float gv, int n_threads) {
    if (n_pixels < 0) return -1;
    int nt = n_threads > 0
                 ? n_threads
                 : static_cast<int>(std::thread::hardware_concurrency());
    if (nt < 1) nt = 1;
    // threading only pays above ~64k pixels
    if (nt == 1 || n_pixels < (1 << 16)) {
        hsv_range(src, dst, 0, n_pixels, gh, gs, gv);
        return 0;
    }
    std::vector<std::thread> ts;
    const int64_t chunk = (n_pixels + nt - 1) / nt;
    for (int i = 0; i < nt; ++i) {
        const int64_t b = i * chunk;
        const int64_t e = b + chunk < n_pixels ? b + chunk : n_pixels;
        if (b >= e) break;
        ts.emplace_back(hsv_range, src, dst, b, e, gh, gs, gv);
    }
    for (auto& t : ts) t.join();
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// 2-tap bilinear resize on uint8 RGB (half-pixel-center convention) — the
// SAME sampling math as the device preprocess (ops/preprocess._tap_indices)
// and cv2.INTER_LINEAR, so host-side training/eval resizes match what the
// deployed program does on chip (PIL's antialiased resize did not).
// ---------------------------------------------------------------------------

namespace {

struct TapPlan {
    std::vector<int32_t> i0, i1;
    std::vector<float> f;
    TapPlan(int src, int dst) : i0(dst), i1(dst), f(dst) {
        const float scale = static_cast<float>(src) / dst;
        for (int i = 0; i < dst; ++i) {
            const float s = (i + 0.5f) * scale - 0.5f;
            const float s0 = std::floor(s);
            f[i] = s - s0;
            int a = static_cast<int>(s0);
            int b = a + 1;
            i0[i] = a < 0 ? 0 : (a > src - 1 ? src - 1 : a);
            i1[i] = b < 0 ? 0 : (b > src - 1 ? src - 1 : b);
        }
    }
};

void resize_rows(const uint8_t* src, int sw,
                 uint8_t* dst, int dw,
                 const TapPlan& py, const TapPlan& px,
                 int y_begin, int y_end) {
    for (int y = y_begin; y < y_end; ++y) {
        const uint8_t* r0 = src + static_cast<int64_t>(py.i0[y]) * sw * 3;
        const uint8_t* r1 = src + static_cast<int64_t>(py.i1[y]) * sw * 3;
        const float fy = py.f[y];
        uint8_t* out = dst + static_cast<int64_t>(y) * dw * 3;
        for (int x = 0; x < dw; ++x) {
            const int x0 = px.i0[x] * 3, x1 = px.i1[x] * 3;
            const float fx = px.f[x];
            for (int ch = 0; ch < 3; ++ch) {
                const float top = r0[x0 + ch] + fx * (r0[x1 + ch] - r0[x0 + ch]);
                const float bot = r1[x0 + ch] + fx * (r1[x1 + ch] - r1[x0 + ch]);
                out[x * 3 + ch] =
                    static_cast<uint8_t>(top + fy * (bot - top) + 0.5f);
            }
        }
    }
}

}  // namespace

extern "C" {

// src [sh,sw,3]u8 -> dst [dh,dw,3]u8 (must not alias).
int xrseg_resize2tap_u8(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw, int n_threads) {
    if (sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return -1;
    TapPlan py(sh, dh), px(sw, dw);
    int nt = n_threads > 0
                 ? n_threads
                 : static_cast<int>(std::thread::hardware_concurrency());
    if (nt < 1) nt = 1;
    if (nt == 1 || static_cast<int64_t>(dh) * dw < (1 << 16)) {
        resize_rows(src, sw, dst, dw, py, px, 0, dh);
        return 0;
    }
    std::vector<std::thread> ts;
    const int chunk = (dh + nt - 1) / nt;
    for (int i = 0; i < nt; ++i) {
        const int b = i * chunk, e = b + chunk < dh ? b + chunk : dh;
        if (b >= e) break;
        ts.emplace_back([&, b, e] { resize_rows(src, sw, dst, dw,
                                                py, px, b, e); });
    }
    for (auto& t : ts) t.join();
    return 0;
}

}  // extern "C"
