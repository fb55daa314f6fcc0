// Native evaluation kernels for the benchmarking data path.
//
// The reference's only native component is a CUDA dequant pair
// (/root/reference/src/cuda/extensions.py:37-68) — on TPU that role moved to
// Pallas (ops/pallas/). This library covers the framework's HOST-side hot
// loops instead: ROUGE-L longest-common-subsequence (O(n*m) dynamic program,
// the dominant cost of summarization evaluation on long outputs) and clipped
// n-gram overlap counting. Exposed via a C ABI and loaded with ctypes
// (evaluation/rouge.py falls back to pure Python when the library is absent).
//
// Build: g++ -O3 -shared -fPIC rouge_native.cpp -o librouge_native.so
// (runtime/build.py does this on demand and caches the result.)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Longest common subsequence length of two int32 token sequences.
int32_t lcs_len(const int32_t* a, int32_t n, const int32_t* b, int32_t m) {
    if (n <= 0 || m <= 0) return 0;
    std::vector<int32_t> prev(m + 1, 0), cur(m + 1, 0);
    for (int32_t i = 1; i <= n; ++i) {
        const int32_t ai = a[i - 1];
        for (int32_t j = 1; j <= m; ++j) {
            if (ai == b[j - 1]) {
                cur[j] = prev[j - 1] + 1;
            } else {
                cur[j] = prev[j] > cur[j - 1] ? prev[j] : cur[j - 1];
            }
        }
        std::swap(prev, cur);
    }
    return prev[m];
}

// Clipped n-gram overlap: number of n-grams of `a` that also occur in `b`,
// with per-gram counts clipped at b's count (ROUGE-N numerator).
// Token ids are int32; n-grams are hashed with a 64-bit rolling mix.
int64_t ngram_overlap(const int32_t* a, int32_t n_a, const int32_t* b,
                      int32_t n_b, int32_t order) {
    if (order <= 0 || n_a < order || n_b < order) return 0;
    auto hash_at = [order](const int32_t* seq, int32_t i) -> uint64_t {
        uint64_t h = 1469598103934665603ULL;  // FNV-1a over the gram
        for (int32_t k = 0; k < order; ++k) {
            uint64_t x = static_cast<uint64_t>(static_cast<uint32_t>(seq[i + k]));
            h ^= x + 0x9e3779b97f4a7c15ULL;
            h *= 1099511628211ULL;
        }
        return h;
    };
    std::unordered_map<uint64_t, int32_t> counts;
    counts.reserve(static_cast<size_t>(n_b));
    for (int32_t i = 0; i + order <= n_b; ++i) counts[hash_at(b, i)]++;
    int64_t overlap = 0;
    for (int32_t i = 0; i + order <= n_a; ++i) {
        auto it = counts.find(hash_at(a, i));
        if (it != counts.end() && it->second > 0) {
            ++overlap;
            --(it->second);
        }
    }
    return overlap;
}

// Positional token agreement count (token_agreement_rate numerator,
// reference /root/reference/src/evaluation/quality.py:137-150).
int32_t token_agreement(const int32_t* a, int32_t n, const int32_t* b,
                        int32_t m) {
    int32_t L = n < m ? n : m;
    int32_t agree = 0;
    for (int32_t i = 0; i < L; ++i) agree += (a[i] == b[i]);
    return agree;
}

}  // extern "C"
