// Host-side wire-codec kernels for the streaming mesher.
//
// The "packed" value codec (see msd_tpu/mesh.py:_encode_compact_body) ships
// each crossing block as a 32-byte header row -- bytes 0..15 = sign bitmap
// (corner c negative iff bit c set, little-endian bit order), bytes 16..31 =
// present bitmap (corner c has an explicit u8 magnitude iff bit c set) --
// plus one dense u8 magnitude stream covering the present corners of all
// rows in row-major (block, corner) order.  Decoding expands this to the
// [K, pts] float32 corner grid the marching-tets builder consumes: absent
// corners decode to the codec cap (q*255), whose magnitude is never read by
// crossing-edge interpolation.
//
// numpy decodes this with two unpackbits + a boolean scatter -- 130-290 ms
// across runs for the 28 625 crossing rows of the converged N=513 bench
// field (a ~72.8k-ACTIVE-block shell) on a 1-core host, which is why the packed
// codec lost its round-4 A/B there (PERF.md).  The AVX-512 path below maps
// the codec directly onto hardware: each 16-bit present word is a
// __mmask16 driving VEXPANDPS (dense magnitudes -> sparse corner lanes),
// and the sign bitmap is a mask XOR on the float sign bit.  ~8 vector ops
// per 16 corners.

#include <cstdint>
#include <cstring>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

// Portable scalar row decode; also the tail path when the SIMD row would
// overread the magnitude stream.  A short magnitude stream (corrupt
// transfer) never reads out of bounds: demand past n_mags decodes to the
// cap, and the returned consumed count still reflects the true demand so
// the caller's consistency check fires.
inline int64_t decode_row_scalar(const uint8_t* sign, const uint8_t* present,
                                 const uint8_t* mags, int64_t m,
                                 int64_t n_mags, float q, float cap, float* o,
                                 int32_t pts) {
    for (int c = 0; c < pts; ++c) {
        int byte = c >> 3, bit = c & 7;
        int p = (present[byte] >> bit) & 1;
        float v = (p && m < n_mags) ? q * (float)mags[m] : cap;
        m += p;
        o[c] = (sign[byte] >> bit) & 1 ? -v : v;
    }
    return m;
}

}  // namespace

extern "C" {

// bitmaps: [K, 32] u8 rows as described above.
// mags:    [n_mags] u8 dense magnitude stream (row-major present corners).
// out:     [K, pts] float32, fully overwritten.
// Returns the number of magnitudes consumed (== expected n_mags), so the
// caller can assert stream consistency.  pts <= 128; bitmap bits >= pts
// must be zero (the encoder pads with zeros).
int64_t msd_decode_packed(const uint8_t* bitmaps, const uint8_t* mags,
                          int64_t K, int64_t n_mags, int32_t pts, float q,
                          float* out) {
    const float cap = q * 255.0f;
    int64_t m = 0;
#if defined(__AVX512F__)
    if (pts == 125) {
        const __m512 qv = _mm512_set1_ps(q);
        const __m512 capv = _mm512_set1_ps(cap);
        const __m512i signbit = _mm512_set1_epi32((int32_t)0x80000000u);
        for (int64_t k = 0; k < K; ++k) {
            const uint8_t* b = bitmaps + k * 32;
            float* o = out + k * 125;
            // a full row consumes <= 125 magnitudes; each chunk's 16-byte
            // magnitude load reads at most 15 bytes past the consumed
            // prefix, so m + 125 + 15 <= n_mags keeps every load in bounds
            if (m + 140 > n_mags) {
                m = decode_row_scalar(b, b + 16, mags, m, n_mags, q, cap, o, 125);
                continue;
            }
            uint16_t sw[8], pw[8];
            std::memcpy(sw, b, 16);
            std::memcpy(pw, b + 16, 16);
            for (int j = 0; j < 8; ++j) {
                __mmask16 pm = (__mmask16)pw[j];
                __m128i m8 = _mm_loadu_si128((const __m128i*)(mags + m));
                __m512 mf = _mm512_mul_ps(
                    _mm512_cvtepi32_ps(_mm512_cvtepu8_epi32(m8)), qv);
                __m512 v = _mm512_mask_expand_ps(capv, pm, mf);
                __m512i vi = _mm512_castps_si512(v);
                vi = _mm512_mask_xor_epi32(vi, (__mmask16)sw[j], vi, signbit);
                if (j < 7) {
                    _mm512_storeu_ps(o + 16 * j, _mm512_castsi512_ps(vi));
                } else {
                    // corners 112..124 (13 lanes)
                    _mm512_mask_storeu_ps(o + 112, (__mmask16)0x1FFF,
                                          _mm512_castsi512_ps(vi));
                }
                m += _mm_popcnt_u32((unsigned)pm);
            }
        }
        return m;
    }
#endif
    for (int64_t k = 0; k < K; ++k) {
        const uint8_t* b = bitmaps + k * 32;
        m = decode_row_scalar(b, b + 16, mags, m, n_mags, q, cap,
                              out + (int64_t)k * pts, pts);
    }
    return m;
}

// 1 when the AVX-512 (VEXPANDPS) row decoder compiled in, 0 when
// msd_decode_packed is the portable scalar loop.  The host-aware codec
// default (msd_tpu/stream_knobs.py) keys on this: the 1-core packed
// preference is only benchmarked on the SIMD path.
int32_t msd_codec_simd(void) {
#if defined(__AVX512F__)
    return 1;
#else
    return 0;
#endif
}

}  // extern "C"
