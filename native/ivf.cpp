// Native IVF construction: stable counting sort of embedding ids by
// centroid code. The numpy path is an O(N log N) comparison argsort; this
// is two O(N) passes — the host-side hot spot of index builds and of every
// IndexUpdater IVF rebuild (113M codes at the 1M-passage scale).
//
// Semantics match np.argsort(codes, kind="stable") exactly:
//   - entries are grouped by code in ascending code order,
//   - within a code, original order (ascending id) is preserved,
//   - codes >= k (the IndexUpdater's virtual tombstone-overflow cell) sort
//     to the tail in stable order and are not counted in lengths_out.
//
// Built with g++ via the same on-first-use scheme as wordpiece.cpp
// (colbert_tpu/indexing/native_ivf.py); pure C ABI, ctypes-loaded.

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// codes: n uint32 values; lengths_out: k int32 (counts per cell, excluding
// codes >= k); ivf_out: n int32 embedding ids, cells grouped ascending with
// >= k entries at the tail. Returns 0 on success, -1 on overflow (n or a
// cell count exceeding int32).
int build_ivf_counting(const uint32_t* codes, int64_t n, int64_t k,
                       int32_t* ivf_out, int32_t* lengths_out) {
    if (n > INT32_MAX) return -1;
    std::vector<int64_t> offs(static_cast<size_t>(k) + 1, 0);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t c = codes[i];
        if (c < k) ++offs[c];
    }
    int64_t acc = 0;
    for (int64_t c = 0; c < k; ++c) {
        int64_t cnt = offs[c];
        lengths_out[c] = static_cast<int32_t>(cnt);
        offs[c] = acc;
        acc += cnt;
    }
    int64_t tail = acc;
    for (int64_t i = 0; i < n; ++i) {
        uint32_t c = codes[i];
        if (c < k) {
            ivf_out[offs[c]++] = static_cast<int32_t>(i);
        } else {
            ivf_out[tail++] = static_cast<int32_t>(i);
        }
    }
    return 0;
}

}  // extern "C"
