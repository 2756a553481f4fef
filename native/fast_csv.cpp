// fast_csv — multithreaded numeric CSV reader for wide data_sum shards.
//
// The reference loads eight data_sum shards (~984 columns x up to 56k rows,
// utils/data_loaders.py:255-290) through pandas; the parse dominates
// dataset-build time.  This reader mmaps the file, splits it at newline
// boundaries across hardware threads, and extracts a caller-selected subset
// of columns into a float32 matrix.  Non-numeric cells (e.g. the data_dir
// string column, if selected) parse to NaN.
//
// C ABI (consumed via ctypes from
// icra2021_multimodal_ad_tpu/data/fast_csv.py):
//   fast_csv_dims(path, &rows, &cols)           -> 0 ok / <0 errno-ish
//   fast_csv_read_f32(path, sel, n_sel, out, max_rows) -> rows parsed
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread fast_csv.cpp -o libfastcsv.so

#include <atomic>
#include <cctype>
#include <cerrno>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
    const char* data = nullptr;
    size_t size = 0;
    int fd = -1;
    bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
    Mapped m;
    m.fd = ::open(path, O_RDONLY);
    if (m.fd < 0) return m;
    struct stat st;
    if (::fstat(m.fd, &st) != 0 || st.st_size == 0) {
        ::close(m.fd);
        m.fd = -1;
        return m;
    }
    void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
    if (p == MAP_FAILED) {
        ::close(m.fd);
        m.fd = -1;
        return m;
    }
    m.data = static_cast<const char*>(p);
    m.size = static_cast<size_t>(st.st_size);
    return m;
}

void unmap(Mapped& m) {
    if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
    if (m.fd >= 0) ::close(m.fd);
}

// end of the current line (index of '\n' or end-of-buffer)
size_t line_end(const char* d, size_t size, size_t pos) {
    const void* nl = ::memchr(d + pos, '\n', size - pos);
    return nl ? static_cast<size_t>(static_cast<const char*>(nl) - d) : size;
}

int count_columns(const char* d, size_t end) {
    int cols = 1;
    bool quoted = false;
    for (size_t i = 0; i < end; ++i) {
        char c = d[i];
        if (c == '"') quoted = !quoted;
        else if (c == ',' && !quoted) ++cols;
    }
    return cols;
}

size_t count_rows(const char* d, size_t size, size_t from) {
    size_t rows = 0;
    size_t pos = from;
    while (pos < size) {
        size_t e = line_end(d, size, pos);
        size_t real_end = e;  // mirror the read path: '\r'-only lines are blank
        if (real_end > pos && d[real_end - 1] == '\r') --real_end;
        if (real_end > pos) ++rows;  // skip blank lines
        pos = e + 1;
    }
    return rows;
}

// Quotes anywhere in the file mean fields may hide commas or newlines from
// the naive splitters (and the Python-side header split) — defer those
// files to pandas wholesale.  The ETL never emits quoted cells, so this
// rejects only foreign CSVs.
bool has_quotes(const char* d, size_t size) {
    return ::memchr(d, '"', size) != nullptr;
}

// parse one data line: write selected fields into out (n_sel floats)
void parse_line(const char* d, size_t begin, size_t end,
                const int32_t* sel_flag, const int32_t* sel_slot,
                int total_cols, float* out, int n_sel) {
    for (int k = 0; k < n_sel; ++k)
        out[k] = std::nanf("");
    int col = 0;
    size_t pos = begin;
    bool quoted = false;
    size_t field_start = begin;
    for (size_t i = begin; i <= end; ++i) {
        char c = (i < end) ? d[i] : ',';  // virtual trailing comma
        if (c == '"') {
            quoted = !quoted;
        } else if (c == ',' && !quoted) {
            if (col < total_cols && sel_flag[col] >= 0) {
                size_t fs = field_start;
                size_t len = i - fs;
                // from_chars rejects leading whitespace (strtof skipped
                // it); tolerate space-padded fields explicitly
                while (len > 0 && (d[fs] == ' ' || d[fs] == '\t')) {
                    ++fs;
                    --len;
                }
                if (len > 0) {
                    // from_chars: locale-independent (strtof honors
                    // LC_NUMERIC — a comma-decimal locale set by any
                    // library in the process would silently mis-parse)
                    float v = 0.0f;
                    auto res = std::from_chars(d + fs, d + fs + len, v);
                    if (res.ec == std::errc()) out[sel_slot[col]] = v;
                }
            }
            ++col;
            field_start = i + 1;
        }
        (void)pos;
    }
}

}  // namespace

extern "C" {

// rows (excluding header) and column count; 0 on success,
// -1 unreadable, -5 quoted cells present (caller must use pandas)
int fast_csv_dims(const char* path, long* rows, int* cols) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (has_quotes(m.data, m.size)) {
        unmap(m);
        return -5;
    }
    size_t hdr_end = line_end(m.data, m.size, 0);
    *cols = count_columns(m.data, hdr_end);
    *rows = static_cast<long>(count_rows(m.data, m.size, hdr_end + 1));
    unmap(m);
    return 0;
}

// Read selected columns (by 0-based index, n_sel of them) into out
// (row-major rows x n_sel).  Returns number of rows parsed, or <0 on error.
long fast_csv_read_f32(const char* path, const int32_t* sel, int n_sel,
                       float* out, long max_rows) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (has_quotes(m.data, m.size)) {
        unmap(m);
        return -5;
    }
    size_t hdr_end = line_end(m.data, m.size, 0);
    int total_cols = count_columns(m.data, hdr_end);

    // selection lookup tables; duplicate selections would clobber the slot
    // table (last wins, earlier column stuck at NaN) — reject them
    std::vector<int32_t> flag(total_cols, -1), slot(total_cols, -1);
    for (int k = 0; k < n_sel; ++k) {
        if (sel[k] < 0 || sel[k] >= total_cols || slot[sel[k]] >= 0) {
            unmap(m);
            return -2;
        }
        flag[sel[k]] = 1;
        slot[sel[k]] = k;
    }

    // collect line spans (start, end) for data rows
    std::vector<std::pair<size_t, size_t>> lines;
    lines.reserve(4096);
    size_t pos = hdr_end + 1;
    while (pos < m.size && static_cast<long>(lines.size()) < max_rows) {
        size_t e = line_end(m.data, m.size, pos);
        size_t real_end = e;
        if (real_end > pos && m.data[real_end - 1] == '\r') --real_end;
        if (real_end > pos) lines.emplace_back(pos, real_end);
        pos = e + 1;
    }
    const long n_rows = static_cast<long>(lines.size());

    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    if (static_cast<long>(n_threads) > n_rows)
        n_threads = static_cast<unsigned>(n_rows > 0 ? n_rows : 1);

    auto worker = [&](long r0, long r1) {
        for (long r = r0; r < r1; ++r) {
            parse_line(m.data, lines[r].first, lines[r].second, flag.data(),
                       slot.data(), total_cols, out + r * n_sel, n_sel);
        }
    };
    if (n_threads <= 1) {
        worker(0, n_rows);
    } else {
        std::vector<std::thread> pool;
        long chunk = (n_rows + n_threads - 1) / n_threads;
        for (unsigned t = 0; t < n_threads; ++t) {
            long r0 = t * chunk;
            long r1 = std::min<long>(r0 + chunk, n_rows);
            if (r0 >= r1) break;
            pool.emplace_back(worker, r0, r1);
        }
        for (auto& th : pool) th.join();
    }

    unmap(m);
    return n_rows;
}

}  // extern "C"
