// Host-side native kernels for exllama_tpu: GPTQ unpack/repack and sampler
// helpers. This is the TPU build's analogue of the reference's load-time
// native work (q4_matrix.cu make_sequential repack) and CPU sampler helper
// (cpu_func/rep_penalty.cpp) — here it runs on the host CPU with OpenMP,
// since on TPU the device-side compute is Pallas/XLA.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Layout contract (must match exllama_tpu/formats/gptq.py):
//   * GPTQ qweight: int32 [K/8, N], bits 4*i of word (r, n) hold the 4-bit
//     value of W[r*8+i, n].
//   * TPU kgroup layout: int32 [K/8, N_pad], N_pad = ceil(N/1024)*1024.
//     Within each quantization group g (gs logical rows), byte
//     b = 2*(row in group half) at int8 row r' = g*gs/2 + (row % (gs/2)):
//     the LOW nibble of byte r' holds logical row g*gs + (r' - g*gs/2)
//     and the HIGH nibble holds logical row g*gs + gs/2 + (r' - g*gs/2),
//     stored XOR 8 (top bit flipped). int8 row r' lives in int32 word
//     r'/4, byte r'%4 (little endian).

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

static const int N_ALIGN = 1024;

// GPTQ [K/8, N] int32  →  kgroup layout [K/8, N_pad] int32, with an
// optional logical-row permutation x_map (act-order make_sequential):
// logical row r of the output takes wire row x_map[r]. Pass nullptr for
// identity.
void gptq_repack_kgroup(
    const int32_t* qweight,   // [K/8, N]
    int32_t* out,             // [K/8, N_pad], caller-allocated
    const int32_t* x_map,     // [K] or nullptr
    int64_t K,
    int64_t N,
    int64_t gs)
{
    const int64_t n_pad = ((N + N_ALIGN - 1) / N_ALIGN) * N_ALIGN;
    const int64_t half = gs / 2;

#pragma omp parallel for schedule(static)
    for (int64_t rw = 0; rw < K / 8; rw++) {      // output word row
        uint32_t* out_row = (uint32_t*)out + rw * n_pad;
        std::memset(out_row, 0, n_pad * sizeof(uint32_t));
        for (int j = 0; j < 4; j++) {             // byte within word
            const int64_t rp = 4 * rw + j;        // int8 row
            const int64_t g = rp / half;
            const int64_t off = rp % half;
            const int64_t lo_r = g * gs + off;
            const int64_t hi_r = g * gs + half + off;
            const int64_t lo_src = x_map ? (int64_t)x_map[lo_r] : lo_r;
            const int64_t hi_src = x_map ? (int64_t)x_map[hi_r] : hi_r;
            const uint32_t* lo_row =
                (const uint32_t*)qweight + (lo_src / 8) * N;
            const uint32_t* hi_row =
                (const uint32_t*)qweight + (hi_src / 8) * N;
            const int lo_sh = 4 * (int)(lo_src % 8);
            const int hi_sh = 4 * (int)(hi_src % 8);
            const int bsh = 8 * j;
            for (int64_t c = 0; c < N; c++) {
                const uint32_t lo = (lo_row[c] >> lo_sh) & 0xF;
                const uint32_t hi = ((hi_row[c] >> hi_sh) & 0xF) ^ 8u;
                out_row[c] |= (lo | (hi << 4)) << bsh;
            }
        }
    }
}

// GPTQ [K/8, N] int32 → npair layout [K/4, N_pad/2] int32, with an
// optional logical-row permutation x_map (act-order make_sequential).
// Byte at (row k, packed col J): within each 1024-column block b = J/512,
// LOW nibble = W[k, b*1024 + J%512], HIGH nibble = W[k, b*1024 + 512 +
// J%512] XOR 8 (see exllama_tpu/formats/gptq.py pack_npair). int8 row k
// lives in int32 word k/4, byte k%4 (little endian).
void gptq_repack_npair(
    const int32_t* qweight,   // [K/8, N]
    int32_t* out,             // [K/4, N_pad/2], caller-allocated
    const int32_t* x_map,     // [K] or nullptr
    int64_t K,
    int64_t N)
{
    const int64_t n_pad = ((N + N_ALIGN - 1) / N_ALIGN) * N_ALIGN;
    const int64_t npk = n_pad / 2;
    const int64_t half = N_ALIGN / 2;   // 512

#pragma omp parallel for schedule(static)
    for (int64_t rw = 0; rw < K / 4; rw++) {      // output word row
        uint32_t* out_row = (uint32_t*)out + rw * npk;
        std::memset(out_row, 0, npk * sizeof(uint32_t));
        for (int j = 0; j < 4; j++) {             // byte within word
            const int64_t r = 4 * rw + j;         // logical row
            const int64_t src = x_map ? (int64_t)x_map[r] : r;
            const uint32_t* src_row =
                (const uint32_t*)qweight + (src / 8) * N;
            const int sh = 4 * (int)(src % 8);
            const int bsh = 8 * j;
            for (int64_t J = 0; J < npk; J++) {
                const int64_t b = J / half;
                const int64_t c = J % half;
                const int64_t lo_c = b * N_ALIGN + c;
                const int64_t hi_c = b * N_ALIGN + half + c;
                const uint32_t lo =
                    lo_c < N ? (src_row[lo_c] >> sh) & 0xF : 0u;
                const uint32_t hi =
                    (hi_c < N ? (src_row[hi_c] >> sh) & 0xF : 0u) ^ 8u;
                out_row[J] |= (lo | (hi << 4)) << bsh;
            }
        }
    }
}

// GPTQ qzeros [G, N/8] int32 column-packed → unpacked float32 [G, N] of
// (stored_zero + 1) * scale, i.e. the precomputed zscale used by the
// dequant kernel. scales are fp16 bits (uint16) as stored in checkpoints.
static inline float half_to_float(uint16_t h) {
    const uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t f;
    if (exp == 0) {
        if (man == 0) { f = sign; }
        else {
            // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3FF;
            f = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        f = sign | 0x7F800000u | (man << 13);
    } else {
        f = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &f, 4);
    return out;
}

void gptq_zscale(
    const int32_t* qzeros,    // [G, N/8]
    const uint16_t* scales,   // [G, N] fp16 bits
    float* scales_out,        // [G, N_pad] f32 (zero-padded)
    float* zscale_out,        // [G, N_pad] f32
    int64_t G,
    int64_t N)
{
    const int64_t n_pad = ((N + N_ALIGN - 1) / N_ALIGN) * N_ALIGN;
#pragma omp parallel for schedule(static)
    for (int64_t g = 0; g < G; g++) {
        const uint32_t* zrow = (const uint32_t*)qzeros + g * (N / 8);
        const uint16_t* srow = scales + g * N;
        float* so = scales_out + g * n_pad;
        float* zo = zscale_out + g * n_pad;
        for (int64_t c = 0; c < N; c++) {
            const uint32_t z = (zrow[c / 8] >> (4 * (c % 8))) & 0xF;
            const float s = half_to_float(srow[c]);
            so[c] = s;
            zo[c] = (float)(z + 1) * s;
        }
        for (int64_t c = N; c < n_pad; c++) { so[c] = 0.f; zo[c] = 0.f; }
    }
}

// Stable argsort of g_idx → x_map (act-order make_sequential row order).
void gptq_make_x_map(
    const int32_t* g_idx,     // [K]
    int32_t* x_map,           // [K] out
    int64_t K,
    int32_t groups)
{
    // counting sort by group id (stable)
    int64_t* counts = new int64_t[groups + 1]();
    for (int64_t r = 0; r < K; r++) counts[g_idx[r] + 1]++;
    for (int32_t g = 0; g < groups; g++) counts[g + 1] += counts[g];
    for (int64_t r = 0; r < K; r++) x_map[counts[g_idx[r]]++] = (int32_t)r;
    delete[] counts;
}

// Repetition-penalty mask over the vocab (parity with the reference's
// rep_penalty_cpu, cpu_func/rep_penalty.cpp:5-31). Kept for host-side
// sampling paths and as a cross-check for the on-device implementation.
void rep_penalty_mask_cpu(
    int32_t vocab_size,
    const int64_t* sequence,
    float* rep_mask,          // [vocab] out, init to 1.0
    float penalty_max,
    int32_t sustain,
    int32_t decay,
    int32_t seq_len)
{
    for (int32_t i = 0; i < vocab_size; i++) rep_mask[i] = 1.0f;
    float v = penalty_max;
    const float dv = decay ? (1.0f - penalty_max) / (float)decay : 0.0f;
    int32_t s = sustain == -1 ? seq_len : sustain;
    int32_t beg = seq_len - s - decay;
    if (beg < 0) beg = 0;
    for (int32_t i = seq_len; i > beg;) {
        const int64_t t = sequence[--i];
        if (t >= 0 && t < vocab_size && v > rep_mask[t]) rep_mask[t] = v;
        if (--s < 0) v += dv;
    }
}

int32_t host_lib_version() { return 2; }

}  // extern "C"
