// Interleaved-lane rANS kernels — native host implementation.
//
// Bit-exact to the jax kernels in rpcc_tpu/ops/rans.py (PROB_BITS=14,
// 32-bit state, 16-bit renormalized IO, encode walks symbols in reverse):
// lanes are fully independent at encode, so each lane runs as a tight
// sequential loop instead of a lockstep lax.scan — ~50x faster than the
// jax-on-CPU formulation on a 1-core host, where the entropy stage bounds
// end-to-end throughput.  OpenMP parallelizes over frames when cores exist.
//
// Decode context modes:
//   0: zigzag-magnitude buckets of the lane's own previous symbol
//      (edges 1,3,8 on |delta| = (sym+1)/2) — the residual-stream model;
//   1: wavefront bits — ctx = 2*prev[lane-1] + prev[lane]; lane l step t
//      depends on lane l-1 step t-1, so lane-major decode order is causal;
//   2: always context 0 (order-0 containers).

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t PROB_BITS = 14;
constexpr uint32_t M = 1u << PROB_BITS;
constexpr uint32_t RANS_L = 1u << 16;

inline int zigzag_ctx(int32_t prev) {
    int32_t mag = (prev + 1) >> 1;
    return (mag >= 1) + (mag >= 3) + (mag >= 8);
}

}  // namespace

extern "C" {

// sym/ctx: (B, L, T) int32; freqs: (B, C, A) uint16; cums: (B, C, A) uint32.
// Outputs: words (B, L, T) u16 front-packed per lane, counts (B, L) i32,
// states (B, L) u32.
void rans_encode_ctx_batch(const int32_t* sym, const int32_t* ctx,
                           const uint16_t* freqs, const uint32_t* cums,
                           int B, int L, int T, int C, int A,
                           uint16_t* words, int32_t* counts, uint32_t* states) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int b = 0; b < B; b++) {
        const int32_t* sb = sym + (size_t)b * L * T;
        const int32_t* cb = ctx + (size_t)b * L * T;
        const uint16_t* fb = freqs + (size_t)b * C * A;
        const uint32_t* qb = cums + (size_t)b * C * A;
        for (int l = 0; l < L; l++) {
            const int32_t* s = sb + (size_t)l * T;
            const int32_t* cx = cb + (size_t)l * T;
            uint16_t* w = words + ((size_t)b * L + l) * T;
            uint32_t x = RANS_L;
            int32_t cnt = 0;
            for (int t = T - 1; t >= 0; t--) {
                uint32_t f = fb[(size_t)cx[t] * A + s[t]];
                uint32_t c = qb[(size_t)cx[t] * A + s[t]];
                if ((x >> 18) >= f) {
                    w[cnt++] = (uint16_t)(x & 0xFFFFu);
                    x >>= 16;
                }
                x = (x / f) * M + c + (x % f);
            }
            counts[(size_t)b * L + l] = cnt;
            states[(size_t)b * L + l] = x;
        }
    }
}

// words: (B, L, T) u16 front-packed; slot2sym: (B, C, M) u16.
// mode: 0 zigzag buckets, 1 wavefront bits, 2 always-ctx-0.
// sym_out: (B, L, T) int32.
void rans_decode_ctx_batch(const uint16_t* words, const int32_t* counts,
                           const uint32_t* states, const uint16_t* freqs,
                           const uint32_t* cums, const uint16_t* slot2sym,
                           int B, int L, int T, int C, int A, int mode,
                           int32_t* sym_out) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int b = 0; b < B; b++) {
        const uint16_t* fq = freqs + (size_t)b * C * A;
        const uint32_t* qb = cums + (size_t)b * C * A;
        const uint16_t* s2s = slot2sym + (size_t)b * C * M;
        int32_t* ob = sym_out + (size_t)b * L * T;
        // lane-major is causal for every mode: mode 0/2 use only the lane's
        // own history; mode 1 additionally reads lane l-1's (already fully
        // decoded) symbol at t-1.
        for (int l = 0; l < L; l++) {
            const uint16_t* w = words + ((size_t)b * L + l) * T;
            int32_t* out = ob + (size_t)l * T;
            const int32_t* above = l > 0 ? ob + (size_t)(l - 1) * T : nullptr;
            uint32_t x = states[(size_t)b * L + l];
            int32_t cur = counts[(size_t)b * L + l];
            int32_t prev = 0;
            for (int t = 0; t < T; t++) {
                int cid = 0;
                if (t > 0) {
                    if (mode == 0) {
                        cid = zigzag_ctx(prev);
                    } else if (mode == 1) {
                        int32_t ab = above ? above[t - 1] : 0;
                        cid = 2 * ab + prev;
                    }
                }
                uint32_t slot = x & (M - 1);
                int32_t s = s2s[(size_t)cid * M + slot];
                uint32_t f = fq[(size_t)cid * A + s];
                uint32_t c = qb[(size_t)cid * A + s];
                x = f * (x >> PROB_BITS) + slot - c;
                if (x < RANS_L) {
                    cur -= 1;
                    uint32_t wv = w[cur > 0 ? cur : 0];
                    x = (x << 16) | wv;
                }
                out[t] = s;
                prev = s;
            }
        }
    }
}

}  // extern "C"
