// Fast 4DN pairs-file scanner: gzip streaming, tokenizing, fragment
// binning and pair-count accumulation in one pass.
//
// Native counterpart of instagraal_tpu.io.pairs.pairs_to_pixels — the
// host pipeline's dominant cost on large datasets (the reference streams
// pairs files 4-5 times in per-line Python, SURVEY.md §3.5). Exposed to
// Python through ctypes (see instagraal_tpu/native/__init__.py); the
// pandas implementation remains as a portable fallback.
//
// Build:  g++ -O3 -shared -fPIC -std=c++17 pairs_scan.cpp -lz -o libpairs_scan.so

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ChromIndex {
    // fragment start positions per chromosome + global id offset
    std::unordered_map<std::string, int32_t> chrom_ids;
    std::vector<std::vector<int64_t>> starts;  // per chrom, sorted
    std::vector<int64_t> offsets;              // global bin id offset
};

// 1-based position -> global fragment id, or -1
inline int64_t pos_to_bin(const ChromIndex& idx, int32_t cid, int64_t pos) {
    const std::vector<int64_t>& s = idx.starts[cid];
    int64_t p = pos - 1;  // hicstuff convention: pos-1 before search
    // upper_bound(s, p) - 1
    int64_t lo = 0, hi = (int64_t)s.size();
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (s[mid] <= p) lo = mid + 1; else hi = mid;
    }
    int64_t i = lo - 1;
    if (i < 0) return -1;
    return idx.offsets[cid] + i;
}

// Simple line reader over gzFile (handles plain files too: zlib reads
// uncompressed data transparently).
class GzLineReader {
  public:
    explicit GzLineReader(const char* path) : f_(gzopen(path, "rb")) {}
    ~GzLineReader() { if (f_) gzclose(f_); }
    bool ok() const { return f_ != nullptr; }

    // returns false at EOF
    bool next_line(std::string& out) {
        out.clear();
        while (true) {
            if (pos_ >= len_) {
                len_ = gzread(f_, buf_, sizeof(buf_));
                pos_ = 0;
                if (len_ <= 0) return !out.empty();
            }
            char* nl = (char*)memchr(buf_ + pos_, '\n', len_ - pos_);
            if (nl) {
                out.append(buf_ + pos_, nl - (buf_ + pos_));
                pos_ = (nl - buf_) + 1;
                return true;
            }
            out.append(buf_ + pos_, len_ - pos_);
            pos_ = len_;
        }
    }

  private:
    gzFile f_;
    char buf_[1 << 16];
    int pos_ = 0;
    int len_ = 0;
};

}  // namespace

extern "C" {

// Scan a pairs file and accumulate upper-triangular fragment pixel
// counts.
//
// chrom_blob: n_chroms null-terminated names, concatenated.
// starts: all fragment start positions, concatenated per chromosome in
//   the same order; starts_per_chrom gives each chromosome's count.
// col_*: 0-based column indices of chr1/pos1/chr2/pos2 (from the
//   #columns: header, parsed by the Python caller).
//
// Output: out_keys receives bin1*n_frags+bin2 keys (sorted, unique),
// out_counts the per-key count. Returns the number of unique keys, or
// -1 on IO error, or -2 if capacity is too small. total_pairs receives
// the number of successfully binned pairs.
int64_t pairs_scan(
    const char* path,
    const char* chrom_blob,
    int32_t n_chroms,
    const int64_t* starts,
    const int64_t* starts_per_chrom,
    int32_t col_chr1, int32_t col_pos1, int32_t col_chr2, int32_t col_pos2,
    int64_t* out_keys,
    int64_t* out_counts,
    int64_t capacity,
    int64_t* total_pairs) {
    ChromIndex idx;
    {
        const char* p = chrom_blob;
        int64_t off = 0;
        for (int32_t c = 0; c < n_chroms; ++c) {
            std::string name(p);
            p += name.size() + 1;
            idx.chrom_ids.emplace(std::move(name), c);
            int64_t n = starts_per_chrom[c];
            idx.starts.emplace_back(starts, starts + n);
            idx.offsets.push_back(off);
            off += n;
            starts += n;
        }
        // n_frags = off
        if (off == 0) return 0;
    }
    int64_t n_frags = idx.offsets.back() + (int64_t)idx.starts.back().size();

    GzLineReader reader(path);
    if (!reader.ok()) return -1;

    std::unordered_map<int64_t, int64_t> counts;
    counts.reserve(1 << 20);
    std::string line;
    std::vector<std::pair<const char*, int>> fields;
    int64_t total = 0;
    int max_col = std::max(std::max(col_chr1, col_pos1),
                           std::max(col_chr2, col_pos2));

    while (reader.next_line(line)) {
        if (!line.empty() && line[0] == '#') continue;
        // tokenize on tabs (no allocation: record spans)
        fields.clear();
        const char* s = line.c_str();
        const char* start = s;
        for (const char* q = s;; ++q) {
            if (*q == '\t' || *q == '\0' || *q == '\r') {
                fields.emplace_back(start, (int)(q - start));
                if (*q == '\0' || *q == '\r') break;
                start = q + 1;
            }
        }
        if ((int)fields.size() <= max_col) continue;

        auto it1 = idx.chrom_ids.find(
            std::string(fields[col_chr1].first, fields[col_chr1].second));
        if (it1 == idx.chrom_ids.end()) continue;
        auto it2 = idx.chrom_ids.find(
            std::string(fields[col_chr2].first, fields[col_chr2].second));
        if (it2 == idx.chrom_ids.end()) continue;

        char* endp = nullptr;
        int64_t pos1 = strtoll(fields[col_pos1].first, &endp, 10);
        if (endp == fields[col_pos1].first) continue;
        int64_t pos2 = strtoll(fields[col_pos2].first, &endp, 10);
        if (endp == fields[col_pos2].first) continue;

        int64_t b1 = pos_to_bin(idx, it1->second, pos1);
        int64_t b2 = pos_to_bin(idx, it2->second, pos2);
        if (b1 < 0 || b2 < 0) continue;
        ++total;
        int64_t lo = b1 < b2 ? b1 : b2;
        int64_t hi = b1 < b2 ? b2 : b1;
        ++counts[lo * n_frags + hi];
    }
    *total_pairs = total;

    if ((int64_t)counts.size() > capacity) return -2;
    int64_t n = 0;
    for (const auto& kv : counts) {
        out_keys[n] = kv.first;
        out_counts[n] = kv.second;
        ++n;
    }
    // sort by key (pairs kept aligned via index sort)
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return out_keys[a] < out_keys[b];
    });
    std::vector<int64_t> tmp(n);
    for (int64_t i = 0; i < n; ++i) tmp[i] = out_keys[order[i]];
    memcpy(out_keys, tmp.data(), n * sizeof(int64_t));
    for (int64_t i = 0; i < n; ++i) tmp[i] = out_counts[order[i]];
    memcpy(out_counts, tmp.data(), n * sizeof(int64_t));
    return n;
}

}  // extern "C"
