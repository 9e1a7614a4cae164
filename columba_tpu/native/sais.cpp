// SA-IS suffix array construction (Nong, Zhang & Chan, 2009), clean-room
// textbook implementation. Host-side native component of columba_tpu's index
// builder (role of libsais/divsufsort in the reference build,
// reference: src/buildindex.cpp:479-538).
//
// Exposed C ABI:
//   int sais_u8(const uint8_t* text, int64_t n, int64_t* sa)
// Computes the suffix array of text[0..n) into sa. The text does NOT need an
// explicit sentinel; a virtual smallest sentinel at position n is assumed and
// is not part of the output (sa has n entries, a permutation of 0..n-1).
//
// Build: g++ -O3 -shared -fPIC -o libsais_tpu.so sais.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

typedef int64_t idx_t;

// Generic SA-IS over an integer string s[0..n) with alphabet size sigma.
// A virtual sentinel < all symbols is assumed at position n.
// Writes the suffix array (n entries over positions 0..n-1) into sa.
template <typename S>
void sais(const S* s, idx_t n, idx_t sigma, idx_t* sa) {
    if (n == 0) return;
    if (n == 1) { sa[0] = 0; return; }

    // --- classify: t[i] = true if suffix i is S-type ---
    std::vector<uint8_t> t(n);
    t[n - 1] = 0;  // last real suffix is L-type (sentinel is smaller)
    for (idx_t i = n - 2; i >= 0; --i)
        t[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && t[i + 1]);

    auto is_lms = [&](idx_t i) -> bool {
        return i > 0 && t[i] && !t[i - 1];
    };

    // --- bucket sizes ---
    std::vector<idx_t> bkt(sigma), bkt_start(sigma), bkt_end(sigma);
    for (idx_t i = 0; i < n; ++i) bkt[(idx_t)s[i]]++;
    auto reset_start = [&]() {
        idx_t sum = 0;
        for (idx_t c = 0; c < sigma; ++c) { bkt_start[c] = sum; sum += bkt[c]; }
    };
    auto reset_end = [&]() {
        idx_t sum = 0;
        for (idx_t c = 0; c < sigma; ++c) { sum += bkt[c]; bkt_end[c] = sum; }
    };

    const idx_t EMPTY = -1;

    // --- stage 1: sort LMS positions approximately, then induce ---
    std::memset(sa, 0xff, sizeof(idx_t) * n);  // EMPTY = -1
    reset_end();
    for (idx_t i = 1; i < n; ++i)
        if (is_lms(i)) sa[--bkt_end[(idx_t)s[i]]] = i;
    // guard: induce() skips j == n, but we never store n; EMPTY(-1) handled:
    {
        // L pass
        reset_start();
        sa[bkt_start[(idx_t)s[n - 1]]++] = n - 1;
        for (idx_t i = 0; i < n; ++i) {
            idx_t j = sa[i];
            if (j > 0 && !t[j - 1]) sa[bkt_start[(idx_t)s[j - 1]]++] = j - 1;
        }
        // S pass
        reset_end();
        for (idx_t i = n - 1; i >= 0; --i) {
            idx_t j = sa[i];
            if (j > 0 && t[j - 1]) sa[--bkt_end[(idx_t)s[j - 1]]] = j - 1;
        }
    }

    // --- collect sorted LMS positions ---
    idx_t n_lms = 0;
    for (idx_t i = 0; i < n; ++i)
        if (sa[i] != EMPTY && is_lms(sa[i])) sa[n_lms++] = sa[i];

    // --- name LMS substrings ---
    // use sa[n_lms..n) as scratch for names indexed by position/2
    idx_t* name_buf = sa + n_lms;
    idx_t buf_len = n - n_lms;
    std::vector<idx_t> name_vec;
    idx_t* names;
    if (buf_len >= (n + 1) / 2) {
        names = name_buf;
        std::memset(names, 0xff, sizeof(idx_t) * buf_len);
    } else {
        name_vec.assign((n + 1) / 2, EMPTY);
        names = name_vec.data();
    }

    idx_t name_count = 0, prev = EMPTY;
    for (idx_t r = 0; r < n_lms; ++r) {
        idx_t pos = sa[r];
        bool diff = false;
        if (prev == EMPTY) {
            diff = true;
        } else {
            // compare LMS substrings at prev and pos
            for (idx_t d = 0;; ++d) {
                idx_t a = prev + d, b = pos + d;
                bool a_end = (a == n), b_end = (b == n);
                if (a_end || b_end) { diff = !(a_end && b_end); break; }
                if (s[a] != s[b] || t[a] != t[b]) { diff = true; break; }
                if (d > 0 && (is_lms(a) || is_lms(b))) {
                    diff = !(is_lms(a) && is_lms(b));
                    break;
                }
            }
        }
        if (diff) { ++name_count; prev = pos; }
        names[pos / 2] = name_count - 1;
    }

    // --- build reduced string in LMS order of appearance ---
    std::vector<idx_t> s1(n_lms), lms_pos(n_lms);
    {
        idx_t j = 0;
        for (idx_t i = 1; i < n; ++i)
            if (is_lms(i)) lms_pos[j++] = i;
        for (idx_t i = 0; i < n_lms; ++i) s1[i] = names[lms_pos[i] / 2];
    }

    // --- recurse or directly derive LMS order ---
    std::vector<idx_t> sa1(n_lms);
    if (name_count < n_lms) {
        sais<idx_t>(s1.data(), n_lms, name_count, sa1.data());
    } else {
        for (idx_t i = 0; i < n_lms; ++i) sa1[(idx_t)s1[i]] = i;
    }

    // --- stage 2: place LMS suffixes in true order, induce final SA ---
    std::memset(sa, 0xff, sizeof(idx_t) * n);
    reset_end();
    for (idx_t r = n_lms - 1; r >= 0; --r) {
        idx_t pos = lms_pos[sa1[r]];
        sa[--bkt_end[(idx_t)s[pos]]] = pos;
    }
    {
        reset_start();
        sa[bkt_start[(idx_t)s[n - 1]]++] = n - 1;
        for (idx_t i = 0; i < n; ++i) {
            idx_t j = sa[i];
            if (j > 0 && !t[j - 1]) sa[bkt_start[(idx_t)s[j - 1]]++] = j - 1;
        }
        reset_end();
        for (idx_t i = n - 1; i >= 0; --i) {
            idx_t j = sa[i];
            if (j > 0 && t[j - 1]) sa[--bkt_end[(idx_t)s[j - 1]]] = j - 1;
        }
    }
}

}  // namespace

extern "C" {

int sais_u8(const uint8_t* text, int64_t n, int64_t* sa) {
    if (n < 0 || (n > 0 && (text == nullptr || sa == nullptr))) return -1;
    sais<uint8_t>(text, n, 256, sa);
    return 0;
}

}  // extern "C"
