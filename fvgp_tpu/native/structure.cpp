// Native host runtime for block-sparse structure discovery.
//
// Role in the framework: the reference delegates its host-side neighbor
// search to compiled code (scipy's cKDTree, C++ — /root/reference/fvgp/
// kernels.py:658-738); here the host-side hot path at 10M-point scale is
// (1) Morton codes + argsort for spatial data ordering and (2) bounding-box
// candidate-pair enumeration over the block grid.  Both are O(N·D) /
// O(nb²·D) scans that numpy does single-threaded with temporaries; this
// module does them multi-threaded in one pass.
//
// Exposed through ctypes (no pybind11 in the image); built on demand by
// fvgp_tpu.native (g++ -O3 -fopenmp -shared -fPIC).  The Python layer falls
// back to numpy when the toolchain is unavailable.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <cstring>

extern "C" {

// Spread the low bits of v so consecutive bits land `ndim` apart.  Bits are
// capped so bit*ndim stays inside the 64-bit word (shift past width is UB);
// mirrors fvgp_tpu.parallel.ordering.spread_bits.
static inline uint64_t spread_bits(uint64_t v, int ndim) {
    uint64_t out = 0;
    int bits = 16 < 64 / ndim ? 16 : 64 / ndim;
    for (int bit = 0; bit < bits; ++bit) {
        out |= ((v >> bit) & 1ULL) << (bit * ndim);
    }
    return out;
}

// Morton (Z-order) codes for x (n, d), row-major.  Uses up to the first
// 8 dimensions.  Matches fvgp_tpu.parallel.ordering.morton_order exactly.
void morton_codes(const double* x, int64_t n, int64_t d, uint64_t* out) {
    int use = (int)(d < 8 ? d : 8);
    // per-dimension min/span
    double lo[8], span[8];
    for (int k = 0; k < use; ++k) { lo[k] = x[k]; span[k] = x[k]; }
    for (int64_t i = 0; i < n; ++i) {
        for (int k = 0; k < use; ++k) {
            double v = x[i * d + k];
            if (v < lo[k]) lo[k] = v;
            if (v > span[k]) span[k] = v;
        }
    }
    for (int k = 0; k < use; ++k) {
        span[k] = span[k] - lo[k];
        if (span[k] < 1e-300) span[k] = 1e-300;
    }
    const double scale = 65535.0;  // 2^16 - 1
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        uint64_t code = 0;
        for (int k = 0; k < use; ++k) {
            double u = (x[i * d + k] - lo[k]) / span[k] * scale;
            uint64_t q = (uint64_t)u;
            code |= spread_bits(q, use) << k;
        }
        out[i] = code;
    }
}

// Per-block bounding boxes of x (n, d) blocked into chunks of block_size
// consecutive rows.  lo/hi have shape (nb, d).
void block_bounds(const double* x, int64_t n, int64_t d, int64_t block_size,
                  double* lo, double* hi) {
    int64_t nb = (n + block_size - 1) / block_size;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nb; ++b) {
        int64_t start = b * block_size;
        int64_t end = std::min(n, start + block_size);
        for (int64_t k = 0; k < d; ++k) {
            double mn = x[start * d + k], mx = mn;
            for (int64_t i = start + 1; i < end; ++i) {
                double v = x[i * d + k];
                if (v < mn) mn = v;
                if (v > mx) mx = v;
            }
            lo[b * d + k] = mn;
            hi[b * d + k] = mx;
        }
    }
}

// Upper-triangle candidate block pairs whose box-to-box gap is within
// `radius`.  Returns the number of pairs written (or the required count if
// it exceeds max_pairs — caller re-allocates and calls again).
int64_t candidate_pairs(const double* lo, const double* hi, int64_t nb,
                        int64_t d, double radius, int32_t* rows,
                        int32_t* cols, int64_t max_pairs) {
    const double r2 = radius * radius;
    int64_t count = 0;
    for (int64_t i = 0; i < nb; ++i) {
        for (int64_t j = i; j < nb; ++j) {
            double dist2 = 0.0;
            for (int64_t k = 0; k < d; ++k) {
                double gap1 = lo[j * d + k] - hi[i * d + k];
                double gap2 = lo[i * d + k] - hi[j * d + k];
                double gap = gap1 > gap2 ? gap1 : gap2;
                if (gap > 0.0) dist2 += gap * gap;
                if (dist2 > r2) break;
            }
            if (dist2 <= r2) {
                if (count < max_pairs) {
                    rows[count] = (int32_t)i;
                    cols[count] = (int32_t)j;
                }
                ++count;
            }
        }
    }
    return count;
}

// Exact per-tile liveness: tiles[t] = (block rows[t], block cols[t]) is
// live iff SOME point pair sits within `radius` in whitened coordinates.
// The bounding-box prune is loose (boxes overlap even when no pair is
// inside the support); this is the tight check, with an early exit on the
// first close pair (live tiles finish almost immediately).
// `x` is the whitened (n, d) point array; padded tail handled by n.
void tile_live(const double* x, int64_t n, int64_t d, int64_t block_size,
               const int32_t* rows, const int32_t* cols, int64_t n_tiles,
               double radius, uint8_t* out) {
    const double r2 = radius * radius;
    const int64_t nb = (n + block_size - 1) / block_size;
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t t = 0; t < n_tiles; ++t) {
        const int64_t bi = rows[t];
        const int64_t bj = cols[t];
        if (bi >= nb || bj >= nb) { out[t] = 0; continue; }  // sentinel
        const int64_t i0 = bi * block_size;
        const int64_t i1 = std::min(n, i0 + block_size);
        const int64_t j0 = bj * block_size;
        const int64_t j1 = std::min(n, j0 + block_size);
        uint8_t live = 0;
        for (int64_t i = i0; i < i1 && !live; ++i) {
            const double* xi = x + i * d;
            for (int64_t j = j0; j < j1; ++j) {
                const double* xj = x + j * d;
                double dist2 = 0.0;
                for (int64_t k = 0; k < d; ++k) {
                    const double diff = xi[k] - xj[k];
                    dist2 += diff * diff;
                    if (dist2 >= r2) break;
                }
                if (dist2 < r2) { live = 1; break; }
            }
        }
        out[t] = live;
    }
}

}  // extern "C"
