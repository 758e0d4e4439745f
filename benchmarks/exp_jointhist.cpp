// A/B variants for the host joint-histogram accumulator hot loop
// (native/jointhist.cpp single-pair path). Built standalone by
// benchmarks/exp_jointhist.py; the winner is folded back into
// jointhist.cpp. Entry points share the signature
//   void jh_vN(const uint8_t* px, int64_t n, int stride, int a, int b,
//              uint32_t* hist)
#include <cstdint>
#include <cstring>

extern "C" {

// v0: the shipping loop — run-length-coalesced increment.
void jh_v0(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  if (n <= 0) return;
  const uint8_t* row = px;
  uint32_t prev = (static_cast<uint32_t>(row[a]) << 8) | row[b];
  uint32_t count = 1;
  for (int64_t i = 1; i < n; ++i) {
    row = px + i * stride;
    const uint32_t bin = (static_cast<uint32_t>(row[a]) << 8) | row[b];
    if (bin == prev) {
      ++count;
    } else {
      hist[prev] += count;
      prev = bin;
      count = 1;
    }
  }
  hist[prev] += count;
}

// v1: two-pass blocks — vectorizable bin computation into a u32
// buffer, then a separate increment sweep (decouples the strided
// address math from the histogram's store-to-load dependency).
void jh_v1(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  constexpr int64_t B = 8192;
  uint32_t bins[B];
  for (int64_t base = 0; base < n; base += B) {
    const int64_t m = (n - base) < B ? (n - base) : B;
    const uint8_t* p = px + base * stride;
    for (int64_t i = 0; i < m; ++i) {
      bins[i] =
          (static_cast<uint32_t>(p[i * stride + a]) << 8) | p[i * stride + b];
    }
    for (int64_t i = 0; i < m; ++i) ++hist[bins[i]];
  }
}

// v2: two-pass + run-length coalescing in the increment sweep.
void jh_v2(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  constexpr int64_t B = 8192;
  uint32_t bins[B];
  if (n <= 0) return;
  uint32_t prev = (static_cast<uint32_t>(px[a]) << 8) | px[b];
  uint32_t count = 0;
  for (int64_t base = 0; base < n; base += B) {
    const int64_t m = (n - base) < B ? (n - base) : B;
    const uint8_t* p = px + base * stride;
    for (int64_t i = 0; i < m; ++i) {
      bins[i] =
          (static_cast<uint32_t>(p[i * stride + a]) << 8) | p[i * stride + b];
    }
    for (int64_t i = 0; i < m; ++i) {
      const uint32_t bin = bins[i];
      if (bin == prev) {
        ++count;
      } else {
        hist[prev] += count;
        prev = bin;
        count = 1;
      }
    }
  }
  hist[prev] += count;
}

// v3: two-pass with 2-way sub-histograms in the increment sweep
// (breaks same-bin store-to-load chains at 512 KB of hot bins).
void jh_v3(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  constexpr int64_t B = 8192;
  static thread_local uint32_t h2[65536];
  std::memset(h2, 0, sizeof(h2));
  uint32_t bins[B];
  for (int64_t base = 0; base < n; base += B) {
    const int64_t m = (n - base) < B ? (n - base) : B;
    const uint8_t* p = px + base * stride;
    for (int64_t i = 0; i < m; ++i) {
      bins[i] =
          (static_cast<uint32_t>(p[i * stride + a]) << 8) | p[i * stride + b];
    }
    int64_t i = 0;
    for (; i + 1 < m; i += 2) {
      ++hist[bins[i]];
      ++h2[bins[i + 1]];
    }
    if (i < m) ++hist[bins[i]];
  }
  for (int64_t k = 0; k < 65536; ++k) hist[k] += h2[k];
}

// v4: AVX-512 VBMI bin-gather (16 px / 64-byte load: one vpermb per
// channel + byte interleave -> contiguous u16 bins), then a scalar
// increment sweep. Removes the strided address math from the critical
// path entirely.
#if defined(__AVX512VBMI__) && defined(__AVX512BW__)
#include <immintrin.h>
void jh_v4(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  if (stride != 3) {  // fallback: shipping loop
    jh_v0(px, n, stride, a, b, hist);
    return;
  }
  constexpr int64_t B = 8192;  // pixels per block
  alignas(64) uint16_t bins[B];
  alignas(64) uint8_t idxa[64], idxb[64];
  for (int i = 0; i < 16; ++i) {
    idxa[i] = static_cast<uint8_t>(3 * i + a);
    idxb[i] = static_cast<uint8_t>(3 * i + b);
  }
  for (int i = 16; i < 64; ++i) idxa[i] = idxb[i] = 0;
  const __m512i va = _mm512_load_si512(idxa);
  const __m512i vb = _mm512_load_si512(idxb);
  int64_t i = 0;
  // 16 px per iteration reads 48 bytes + 16 bytes of over-read;
  // stop 6 pixels early so the over-read stays inside the buffer.
  const int64_t simd_n = (n - 6 > 0) ? (n - 6) & ~int64_t(15) : 0;
  for (int64_t base = 0; base < simd_n; base += B) {
    const int64_t m = (simd_n - base) < B ? (simd_n - base) : B;
    const uint8_t* p = px + base * 3;
    for (int64_t k = 0; k + 16 <= m; k += 16) {
      const __m512i z = _mm512_loadu_si512(p + k * 3);
      const __m128i ab =
          _mm512_castsi512_si128(_mm512_permutexvar_epi8(va, z));
      const __m128i bb =
          _mm512_castsi512_si128(_mm512_permutexvar_epi8(vb, z));
      // bin = (A << 8) | B  ->  u16 with low byte B, high byte A.
      _mm_store_si128(reinterpret_cast<__m128i*>(bins + k),
                      _mm_unpacklo_epi8(bb, ab));
      _mm_store_si128(reinterpret_cast<__m128i*>(bins + k + 8),
                      _mm_unpackhi_epi8(bb, ab));
    }
    for (int64_t k = 0; k < m; ++k) ++hist[bins[k]];
  }
  for (i = simd_n; i < n; ++i) {
    const uint8_t* row = px + i * 3;
    ++hist[(static_cast<uint32_t>(row[a]) << 8) | row[b]];
  }
}

// v5: v4's gather + run-length-coalesced increment sweep.
void jh_v5(const uint8_t* px, int64_t n, int stride, int a, int b,
           uint32_t* hist) {
  if (stride != 3 || n <= 0) {
    jh_v0(px, n, stride, a, b, hist);
    return;
  }
  constexpr int64_t B = 8192;
  alignas(64) uint16_t bins[B];
  alignas(64) uint8_t idxa[64], idxb[64];
  for (int i = 0; i < 16; ++i) {
    idxa[i] = static_cast<uint8_t>(3 * i + a);
    idxb[i] = static_cast<uint8_t>(3 * i + b);
  }
  for (int i = 16; i < 64; ++i) idxa[i] = idxb[i] = 0;
  const __m512i va = _mm512_load_si512(idxa);
  const __m512i vb = _mm512_load_si512(idxb);
  const int64_t simd_n = (n - 6 > 0) ? (n - 6) & ~int64_t(15) : 0;
  uint32_t prev = (static_cast<uint32_t>(px[a]) << 8) | px[b];
  uint32_t count = 0;
  for (int64_t base = 0; base < simd_n; base += B) {
    const int64_t m = (simd_n - base) < B ? (simd_n - base) : B;
    const uint8_t* p = px + base * 3;
    for (int64_t k = 0; k + 16 <= m; k += 16) {
      const __m512i z = _mm512_loadu_si512(p + k * 3);
      const __m128i ab =
          _mm512_castsi512_si128(_mm512_permutexvar_epi8(va, z));
      const __m128i bb =
          _mm512_castsi512_si128(_mm512_permutexvar_epi8(vb, z));
      _mm_store_si128(reinterpret_cast<__m128i*>(bins + k),
                      _mm_unpacklo_epi8(bb, ab));
      _mm_store_si128(reinterpret_cast<__m128i*>(bins + k + 8),
                      _mm_unpackhi_epi8(bb, ab));
    }
    for (int64_t k = 0; k < m; ++k) {
      const uint32_t bin = bins[k];
      if (bin == prev) {
        ++count;
      } else {
        hist[prev] += count;
        prev = bin;
        count = 1;
      }
    }
  }
  for (int64_t i = simd_n; i < n; ++i) {
    const uint8_t* row = px + i * 3;
    const uint32_t bin = (static_cast<uint32_t>(row[a]) << 8) | row[b];
    if (bin == prev) {
      ++count;
    } else {
      hist[prev] += count;
      prev = bin;
      count = 1;
    }
  }
  hist[prev] += count;
}
#endif  // __AVX512VBMI__

}  // extern "C"
