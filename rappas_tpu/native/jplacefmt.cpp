// jplace "p"-row batch formatter (host-side hot loop of the placement
// pipeline at production read counts).
//
// The reference assembles placement rows through json_simple object
// trees, one java object per value (Main_PLACEMENT_v07.java:266-315,
// PlacementProcess.java:974-1047) -- fine at 500 reads/s, a bottleneck
// four orders of magnitude up.  Here a whole batch of placements is
// formatted in one call: edge_num / distal_length decimal strings are
// precomputed per node id by the caller (they only depend on the tree),
// so the inner loop is two shortest-round-trip double prints
// (std::to_chars, C++17) and memcpys.
//
// Row layouts (rappas_tpu.place.jplace.JplaceWriter):
//   default: [edge_num, likelihood, like_weight_ratio, distal, 0.0]
//   guppy:   [distal, edge_num, like_weight_ratio, likelihood, 0.0]
//
// Returns the total bytes written, or -1 if the output buffer is too
// small (the caller grows it and retries).

#include <charconv>
#include <cstdint>
#include <cstring>

namespace {

inline char* put_str(char* p, const char* buf, int32_t lo, int32_t hi) {
    std::memcpy(p, buf + lo, hi - lo);
    return p + (hi - lo);
}

inline char* put_f64(char* p, double v) {
    auto res = std::to_chars(p, p + 32, v);
    return res.ptr;
}

}  // namespace

extern "C" {

long long jp_format_rows(
    const int32_t* nodes, const float* scores, const float* lwr,
    const int64_t* row_off, int64_t n,
    const char* estr_buf, const int32_t* estr_off,
    const char* dstr_buf, const int32_t* dstr_off,
    int guppy, char* out, int64_t cap, int64_t* out_off) {
    char* p = out;
    char* end = out + cap;
    for (int64_t i = 0; i < n; ++i) {
        out_off[i] = p - out;
        for (int64_t r = row_off[i]; r < row_off[i + 1]; ++r) {
            // worst case per row: 2 brackets + 4 commas + 2 x 25-char
            // doubles + the two cached strings + ",0.0]"
            int32_t nd = nodes[r];
            int32_t elen = estr_off[nd + 1] - estr_off[nd];
            int32_t dlen = dstr_off[nd + 1] - dstr_off[nd];
            if (end - p < 64 + elen + dlen) return -1;
            if (r > row_off[i]) *p++ = ',';
            *p++ = '[';
            if (guppy) {
                p = put_str(p, dstr_buf, dstr_off[nd], dstr_off[nd + 1]);
                *p++ = ',';
                p = put_str(p, estr_buf, estr_off[nd], estr_off[nd + 1]);
                *p++ = ',';
                p = put_f64(p, (double)lwr[r]);
                *p++ = ',';
                p = put_f64(p, (double)scores[r]);
            } else {
                p = put_str(p, estr_buf, estr_off[nd], estr_off[nd + 1]);
                *p++ = ',';
                p = put_f64(p, (double)scores[r]);
                *p++ = ',';
                p = put_f64(p, (double)lwr[r]);
                *p++ = ',';
                p = put_str(p, dstr_buf, dstr_off[nd], dstr_off[nd + 1]);
            }
            std::memcpy(p, ",0.0]", 5);
            p += 5;
        }
    }
    out_off[n] = p - out;
    return p - out;
}

}  // extern "C"
