// Native data-loader core for sisr_tpu.
//
// The reference (keyber/Single-Image-Super-Resolution) leans on torch's
// C++ DataLoader machinery (num_workers=2, reference config.py:251) for its
// host input pipeline; this is the TPU build's native equivalent: the
// synthetic procedural generator and batch assembly in C++, driven from
// Python via ctypes (sisr_tpu/data/native_loader.py).
//
// Numerics contract: BIT-EXACT parity with SyntheticDataset._generate
// (sisr_tpu/data/pipeline.py:71-91) under numpy 2.x NEP50 promotion.
// That requires a faithful reimplementation of numpy's RNG stack:
//   * SeedSequence entropy pooling (O'Neill seed_seq_fe128: hash/mix with
//     INIT_A/MULT_A/INIT_B/MULT_B, subtractive mix)
//   * PCG64 (XSL-RR 128/64, step-then-output) seeded from
//     generate_state(4, uint64)
//   * next_double = (next64 >> 11) * 2^-53; uniform = lo + range * u
//   * Generator.integers: buffered 32-bit Lemire (low half first, high
//     half buffered in has_uint32/uinteger)
//   * standard_normal: 256-box ziggurat. wi/ki tables are embedded below;
//     they were extracted bit-for-bit from the installed numpy by
//     tools/gen_ziggurat_tables.py (state-injection probing, not copied
//     source). fi[i] = exp(-x_i^2/2) (fi[0] = 1.0) recomputed at init --
//     verified bitwise over millions of draws, zero stream desyncs.
//
// Two ops are NOT reproducible from C libm on this host (numpy's SIMD
// float32 cos/tanh differ from cosf/tanhf by 1 ulp on ~20% of inputs), so
// the pipeline splits: phases() exports the float32 grating phases for
// Python to run np.cos on, images() consumes those cos values and returns
// the PRE-tanh accumulation; Python applies np.tanh. float64 sin IS libm
// on non-AVX512 hosts (verified bitwise), so the wave fields stay native.
//
// Build: g++ -O3 -shared -fPIC [-fopenmp] loader.cpp -o _loader.so

#include <cmath>
#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;

namespace {

// ---------------- SeedSequence (numpy-compatible) ----------------
constexpr uint32_t INIT_A = 0x43b0d7e5u;
constexpr uint32_t MULT_A = 0x931e8875u;
constexpr uint32_t INIT_B = 0x8b51f9ddu;
constexpr uint32_t MULT_B = 0x58f38dedu;
constexpr uint32_t MIX_L = 0xca01f9ddu;
constexpr uint32_t MIX_R = 0x4973f715u;
constexpr int XSHIFT = 16;

struct SeedSeq {
  uint32_t pool[4];

  static uint32_t hashmix(uint32_t value, uint32_t *hash_const) {
    value ^= *hash_const;
    *hash_const *= MULT_A;
    value *= *hash_const;
    value ^= value >> XSHIFT;
    return value;
  }
  static uint32_t mix(uint32_t x, uint32_t y) {
    uint32_t r = x * MIX_L - y * MIX_R;  // subtractive mix (seed_seq_fe)
    r ^= r >> XSHIFT;
    return r;
  }

  explicit SeedSeq(uint64_t entropy) {
    uint32_t ent[2];
    int n_ent;
    if (entropy == 0) {
      ent[0] = 0;
      n_ent = 1;
    } else {
      n_ent = 0;
      uint64_t v = entropy;
      while (v) {
        ent[n_ent++] = (uint32_t)(v & 0xffffffffu);
        v >>= 32;
      }
    }
    uint32_t hc = INIT_A;
    for (int i = 0; i < 4; i++)
      pool[i] = hashmix(i < n_ent ? ent[i] : 0u, &hc);
    for (int s = 0; s < 4; s++)
      for (int d = 0; d < 4; d++)
        if (s != d) pool[d] = mix(pool[d], hashmix(pool[s], &hc));
    for (int s = 4; s < n_ent; s++)
      for (int d = 0; d < 4; d++)
        pool[d] = mix(pool[d], hashmix(ent[s], &hc));
  }

  // generate_state(n, uint64): 2n uint32 words paired little-endian
  void generate_u64(uint64_t *out, int n) const {
    uint32_t hc = INIT_B;
    for (int i = 0; i < 2 * n; i++) {
      uint32_t d = pool[i % 4];
      d ^= hc;
      hc *= MULT_B;
      d *= hc;
      d ^= d >> XSHIFT;
      if (i & 1)
        out[i / 2] |= (uint64_t)d << 32;
      else
        out[i / 2] = d;
    }
  }
};

// ---------------- PCG64 XSL-RR 128/64 ----------------
constexpr u128 PCG_MULT =
    ((u128)2549297995355413924ull << 64) | 4865540595714422341ull;

struct Pcg64 {
  u128 state, inc;
  bool has_uint32;
  uint32_t uinteger;

  explicit Pcg64(uint64_t seed) {
    uint64_t v[4];
    SeedSeq(seed).generate_u64(v, 4);
    u128 initstate = ((u128)v[0] << 64) | v[1];
    u128 initseq = ((u128)v[2] << 64) | v[3];
    inc = (initseq << 1) | 1;
    state = 0;
    step();
    state += initstate;
    step();
    has_uint32 = false;
    uinteger = 0;
  }

  inline void step() { state = state * PCG_MULT + inc; }

  inline uint64_t next64() {
    step();
    uint64_t hi = (uint64_t)(state >> 64), lo = (uint64_t)state;
    unsigned rot = (unsigned)(state >> 122);
    uint64_t x = hi ^ lo;
    return rot ? (x >> rot) | (x << (64 - rot)) : x;
  }

  inline double next_double() {
    return (double)(next64() >> 11) * (1.0 / 9007199254740992.0);
  }

  inline double uniform(double lo, double hi) {
    return lo + (hi - lo) * next_double();
  }

  inline uint32_t next32() {  // buffered halves: low first, high buffered
    if (has_uint32) {
      has_uint32 = false;
      return uinteger;
    }
    uint64_t v = next64();
    has_uint32 = true;
    uinteger = (uint32_t)(v >> 32);
    return (uint32_t)v;
  }

  // Generator.integers [lo, hi) via buffered 32-bit Lemire (ranges < 2^32)
  inline int64_t integers(int64_t lo, int64_t hi) {
    uint32_t rng = (uint32_t)(hi - lo - 1);  // inclusive range
    if (rng == 0) return lo;
    uint32_t rng_excl = rng + 1;
    uint64_t m = (uint64_t)next32() * rng_excl;
    uint32_t leftover = (uint32_t)m;
    if (leftover < rng_excl) {
      uint32_t threshold = (uint32_t)(-(int64_t)rng_excl) % rng_excl;
      while (leftover < threshold) {
        m = (uint64_t)next32() * rng_excl;
        leftover = (uint32_t)m;
      }
    }
    return lo + (int64_t)(m >> 32);
  }
};

// ---------------- ziggurat standard normal ----------------
constexpr double NOR_R = 3.6541528853610088;
constexpr double NOR_INV_R = 0.27366123732975828;

#include "zig_tables.h"  // ZIG_WI[256] (double), ZIG_KI[256] (uint64)

double ZIG_FI[256];
struct FiInit {
  FiInit() {
    for (int i = 0; i < 256; i++) {
      double x = ZIG_WI[i] * 9007199254740992.0 / 2.0;  // wi * 2^52
      ZIG_FI[i] = std::exp(-0.5 * x * x);
    }
    ZIG_FI[0] = 1.0;
  }
} fi_init;

inline double standard_normal(Pcg64 &g) {
  for (;;) {
    uint64_t r = g.next64();
    int idx = (int)(r & 0xff);
    r >>= 8;
    int sign = (int)(r & 1);
    uint64_t rabs = (r >> 1) & 0x000fffffffffffffull;
    double x = (double)rabs * ZIG_WI[idx];
    if (sign) x = -x;
    if (rabs < ZIG_KI[idx]) return x;
    if (idx == 0) {
      for (;;) {
        double xx = -NOR_INV_R * std::log1p(-g.next_double());
        double yy = -std::log1p(-g.next_double());
        if (yy + yy > xx * xx)
          return ((rabs >> 8) & 1) ? -(NOR_R + xx) : NOR_R + xx;
      }
    } else {
      if ((ZIG_FI[idx - 1] - ZIG_FI[idx]) * g.next_double() + ZIG_FI[idx] <
          std::exp(-0.5 * x * x))
        return x;
    }
  }
}

constexpr double TWO_PI = 2.0 * M_PI;  // == python 2*np.pi bitwise

// Draw the grating parameters for one image, mirroring pipeline.py:76-81
// draw order exactly: uniform(0.5,6,2) -> uniform(0,2pi,c) -> uniform(.2,.6)
struct Grating {
  double fx, fy, amp;
  float ph[8];  // c <= 8
};

inline void draw_gratings(Pcg64 &g, int c, Grating out[4]) {
  for (int k = 0; k < 4; k++) {
    out[k].fx = g.uniform(0.5, 6.0);
    out[k].fy = g.uniform(0.5, 6.0);
    for (int ch = 0; ch < c; ch++)
      out[k].ph[ch] = (float)g.uniform(0.0, TWO_PI);
    out[k].amp = g.uniform(0.2, 0.6);
  }
}

// one image, pre-tanh, given numpy-computed cos(ph) values (4*c floats)
void generate_pretanh(uint64_t index, int h, int w, int c,
                      const float *cos_ph, float *out) {
  Pcg64 g((uint64_t)index);
  Grating gr[4];
  draw_gratings(g, c, gr);

  const int64_t npix = (int64_t)h * w * c;
  std::memset(out, 0, npix * sizeof(float));

  // gratings: wave = sin(2pi*(fx*x/w + fy*y/h)) in f64 (separable args),
  // img[p] = f32( f64(img[p]) + (amp*wave)*f64(cos_ph) )  -- NEP50 order
  double *ax = new double[w];
  double *by = new double[h];
  for (int k = 0; k < 4; k++) {
    const double fx = gr[k].fx, fy = gr[k].fy, amp = gr[k].amp;
    for (int x = 0; x < w; x++) ax[x] = fx * (double)(float)x / w;
    for (int y = 0; y < h; y++) by[y] = fy * (double)(float)y / h;
    const float *cp = cos_ph + k * c;
    for (int y = 0; y < h; y++) {
      float *row = out + (int64_t)y * w * c;
      for (int x = 0; x < w; x++) {
        double wave = std::sin(TWO_PI * (ax[x] + by[y]));
        double aw = amp * wave;
        float *px = row + x * c;
        for (int ch = 0; ch < c; ch++)
          px[ch] = (float)((double)px[ch] + aw * (double)cp[ch]);
      }
    }
  }
  delete[] ax;
  delete[] by;

  // rectangles (pipeline.py:84-89): draw order y0, x0, hh, ww, col
  for (int k = 0; k < 8; k++) {
    int64_t y0 = g.integers(0, h - 2);
    int64_t x0 = g.integers(0, w - 2);
    int64_t hh = g.integers(2, h / 3 > 3 ? h / 3 : 3);
    int64_t ww = g.integers(2, w / 3 > 3 ? w / 3 : 3);
    float col[8];
    for (int ch = 0; ch < c; ch++) col[ch] = (float)g.uniform(-1.2, 1.2);
    int64_t y1 = y0 + hh < h ? y0 + hh : h;
    int64_t x1 = x0 + ww < w ? x0 + ww : w;
    for (int64_t y = y0; y < y1; y++) {
      float *row = out + y * w * c;
      for (int64_t x = x0; x < x1; x++)
        for (int ch = 0; ch < c; ch++) row[x * c + ch] += col[ch];
    }
  }

  // gaussian noise: f64 ziggurat draws rounded to f32, f32 += (py :90)
  for (int64_t p = 0; p < npix; p++)
    out[p] += (float)(0.0 + 0.03 * standard_normal(g));
}

}  // namespace

extern "C" {

int sisr_native_abi() { return 3; }

// phases for a batch: out shape (n, 4, c) float32
void sisr_synth_phases(const int64_t *indices, int64_t n, int c, float *out) {
  for (int64_t i = 0; i < n; i++) {
    Pcg64 g((uint64_t)indices[i]);
    Grating gr[4];
    draw_gratings(g, c, gr);
    for (int k = 0; k < 4; k++)
      for (int ch = 0; ch < c; ch++) out[(i * 4 + k) * c + ch] = gr[k].ph[ch];
  }
}

// batch of pre-tanh images given cos(phases) (n,4,c); out (n,h,w,c)
void sisr_synth_pretanh(const int64_t *indices, int64_t n, int h, int w,
                        int c, const float *cos_ph, float *out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < n; i++)
    generate_pretanh((uint64_t)indices[i], h, w, c, cos_ph + i * 4 * c,
                     out + i * (int64_t)h * w * c);
}

// ---- RNG primitive exports for the bitwise parity tests ----
void sisr_rng_raw(uint64_t seed, int64_t n, uint64_t *out) {
  Pcg64 g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = g.next64();
}
void sisr_rng_uniform(uint64_t seed, double lo, double hi, int64_t n,
                      double *out) {
  Pcg64 g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = g.uniform(lo, hi);
}
void sisr_rng_integers(uint64_t seed, int64_t lo, int64_t hi, int64_t n,
                       int64_t *out) {
  Pcg64 g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = g.integers(lo, hi);
}
void sisr_rng_normal(uint64_t seed, int64_t n, double *out) {
  Pcg64 g(seed);
  for (int64_t i = 0; i < n; i++) out[i] = standard_normal(g);
}
void sisr_seedseq_state(uint64_t seed, uint64_t *out4) {
  SeedSeq(seed).generate_u64(out4, 4);
}

}  // extern "C"
