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
//   * TPU panel layout: int32 [K, N_pad/8]; within each panel of
//     PANEL=1024 true columns, nibble i of word column p*128+j holds true
//     column p*1024 + i*128 + j. N_pad = ceil(N/1024)*1024, zero padded.

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

static const int LANE = 128;
static const int PANEL = 8 * LANE;

// GPTQ [K/8, N] int32  →  panel layout [K, N_pad/8] int32, with an optional
// row permutation x_map (act-order make_sequential): output row r takes
// input row x_map[r]. Pass x_map = nullptr for identity.
void gptq_repack_panels(
    const int32_t* qweight,   // [K/8, N]
    int32_t* out,             // [K, N_pad/8], caller-allocated (zeroed here)
    const int32_t* x_map,     // [K] or nullptr
    int64_t K,
    int64_t N)
{
    const int64_t n_pad = ((N + PANEL - 1) / PANEL) * PANEL;
    const int64_t words_out = n_pad / 8;

#pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < K; r++) {
        const int64_t src_r = x_map ? (int64_t)x_map[r] : r;
        const uint32_t* src_row = (const uint32_t*)qweight + (src_r / 8) * N;
        const int shift = 4 * (int)(src_r % 8);
        uint32_t* dst_row = (uint32_t*)out + r * words_out;
        std::memset(dst_row, 0, words_out * sizeof(uint32_t));
        // walk true columns; c = p*PANEL + i*LANE + j → word p*LANE+j, nib i
        for (int64_t c = 0; c < N; c++) {
            const uint32_t q = (src_row[c] >> shift) & 0xF;
            const int64_t p = c / PANEL;
            const int64_t rem = c % PANEL;
            const int64_t i = rem / LANE;
            const int64_t j = rem % LANE;
            dst_row[p * LANE + j] |= q << (4 * i);
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
    const int64_t n_pad = ((N + PANEL - 1) / PANEL) * PANEL;
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

int32_t host_lib_version() { return 1; }

}  // extern "C"
