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

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cerrno>
#include <charconv>
#include <cmath>
#include <limits>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <system_error>
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

template <typename T>
void parse_field(const char* d, size_t fs, size_t fe, T* dst) {
    // from_chars rejects leading whitespace (strtof skipped it);
    // tolerate space-padded fields explicitly.  from_chars is also
    // locale-independent (strtof honors LC_NUMERIC — a comma-decimal
    // locale set by any library in the process would silently mis-parse)
    // and correctly rounded (pandas' default xstrtod parser is not; the
    // two can differ in the last ulp).
    while (fs < fe && (d[fs] == ' ' || d[fs] == '\t')) ++fs;
    if (fs < fe) {
        T v = T(0);
        auto res = std::from_chars(d + fs, d + fe, v);
        if (res.ec == std::errc()) *dst = v;
    }
}

// parse one data line: write selected fields into out (n_sel values).
// head_max is the largest selected index reached by FORWARD scanning;
// n_tail selected fields are addressed BACKWARD from the line end (tail
// slot t holds the (t+1)-th-from-last column).  Skipping the span between
// them is what makes the data_sum schema fast: the light columns are the
// first ~18 of 984 plus the final `label`, so the 963 LiDAR fields are
// never scanned.  Assumes exactly total_cols columns per row (verified on
// the first data row by the caller; the ETL always writes exact widths,
// and quoted/foreign files were already deferred to pandas).
template <typename T>
void parse_line(const char* d, size_t begin, size_t end,
                const int32_t* sel_slot, int head_max,
                const int32_t* tail_slot, int n_tail,
                T* out, int n_sel) {
    for (int k = 0; k < n_sel; ++k)
        out[k] = std::numeric_limits<T>::quiet_NaN();
    size_t field_start = begin;
    for (int col = 0; col <= head_max; ++col) {
        const void* next = (field_start <= end)
            ? ::memchr(d + field_start, ',', end - field_start)
            : nullptr;
        size_t fe = next
            ? static_cast<size_t>(static_cast<const char*>(next) - d)
            : end;
        if (sel_slot[col] >= 0)
            parse_field<T>(d, field_start, fe, out + sel_slot[col]);
        if (!next) return;  // short row: remaining slots stay NaN
        field_start = fe + 1;
    }
    size_t tail_end = end;
    for (int t = 0; t < n_tail; ++t) {
        const void* prev = ::memrchr(d + begin, ',', tail_end - begin);
        size_t fs = prev
            ? static_cast<size_t>(static_cast<const char*>(prev) - d) + 1
            : begin;
        if (tail_slot[t] >= 0)
            parse_field<T>(d, fs, tail_end, out + tail_slot[t]);
        if (!prev) return;
        tail_end = fs - 1;
    }
}

// shared scaffolding of the typed readers: map, validate selection,
// collect line spans, parse across threads.  When str_col >= 0, that
// column's raw text is additionally extracted '\n'-joined into str_out
// (str_cap bytes; *str_written set to bytes used) in the SAME pass —
// Python's light-frame read then needs exactly one native call (and one
// mmap + one quote scan + one line-span scan) per shard instead of three.
template <typename T>
long read_selected(const char* path, const int32_t* sel, int n_sel,
                   T* out, long max_rows, int32_t str_col = -1,
                   char* str_out = nullptr, long str_cap = 0,
                   long* str_written = nullptr) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (has_quotes(m.data, m.size)) {
        unmap(m);
        return -5;
    }
    size_t hdr_end = line_end(m.data, m.size, 0);
    int total_cols = count_columns(m.data, hdr_end);

    // selection lookup table; duplicate selections would clobber the slot
    // table (last wins, earlier column stuck at NaN) — reject them
    std::vector<int32_t> slot(total_cols, -1);
    for (int k = 0; k < n_sel; ++k) {
        if (sel[k] < 0 || sel[k] >= total_cols || slot[sel[k]] >= 0) {
            unmap(m);
            return -2;
        }
        slot[sel[k]] = k;
    }

    // head/tail split: the first `split` selected columns (sorted) are
    // reached by forward scan, the rest backward from the line end.
    // Minimize scanned fields: forward costs (last head index + 1),
    // backward costs (total_cols - first tail index).  On the data_sum
    // schema (light columns = first ~18 of 984 + final `label`) this
    // skips the 963 LiDAR fields entirely.
    std::vector<int32_t> sorted_sel(sel, sel + n_sel);
    std::sort(sorted_sel.begin(), sorted_sel.end());
    long best_cost = -1;
    int best_split = n_sel;
    for (int k = 0; k <= n_sel; ++k) {
        long head = (k > 0) ? sorted_sel[k - 1] + 1 : 0;
        long tail = (k < n_sel) ? total_cols - sorted_sel[k] : 0;
        if (best_cost < 0 || head + tail < best_cost) {
            best_cost = head + tail;
            best_split = k;
        }
    }
    const int head_max = (best_split > 0) ? sorted_sel[best_split - 1] : -1;
    const int n_tail =
        (best_split < n_sel) ? total_cols - sorted_sel[best_split] : 0;
    std::vector<int32_t> tail_slot(n_tail > 0 ? n_tail : 1, -1);
    for (int k = best_split; k < n_sel; ++k)
        tail_slot[total_cols - 1 - sorted_sel[k]] = slot[sorted_sel[k]];

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

    // backward tail addressing assumes exact row widths (the ETL always
    // writes them; quoted/foreign files were already deferred to pandas) —
    // verify the FIRST and LAST data rows and refuse the file otherwise
    // (-4, the Python caller falls back to pandas rather than risk
    // misattributed tail columns).  The last-row check is what catches the
    // realistic corruption: a row torn mid-write by a crashed appender,
    // whose tail scan would otherwise read `label` out of a LiDAR field.
    // A ragged row in the MIDDLE of an append-only CSV stays undetected by
    // design — validating every row would re-scan the very fields the
    // head/tail split exists to skip.
    if (n_tail > 0 && n_rows > 0) {
        for (long r : {0L, n_rows - 1}) {
            int row_cols = 1;
            const char* p = m.data + lines[r].first;
            const char* pe = m.data + lines[r].second;
            while ((p = static_cast<const char*>(::memchr(
                        p, ',', static_cast<size_t>(pe - p)))) != nullptr) {
                ++row_cols;
                ++p;
            }
            if (row_cols != total_cols) {
                unmap(m);
                return -4;
            }
        }
    }

    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    if (static_cast<long>(n_threads) > n_rows)
        n_threads = static_cast<unsigned>(n_rows > 0 ? n_rows : 1);

    auto worker = [&](long r0, long r1) {
        for (long r = r0; r < r1; ++r) {
            parse_line<T>(m.data, lines[r].first, lines[r].second,
                          slot.data(), head_max, tail_slot.data(), n_tail,
                          out + r * n_sel, n_sel);
        }
    };
    if (n_threads <= 1) {
        worker(0, n_rows);
    } else {
        std::vector<std::thread> pool;
        long chunk = (n_rows + n_threads - 1) / n_threads;
        long unstarted = 0;
        for (unsigned t = 0; t < n_threads; ++t) {
            long r0 = t * chunk;
            long r1 = std::min<long>(r0 + chunk, n_rows);
            if (r0 >= r1) break;
            try {
                pool.emplace_back(worker, r0, r1);
            } catch (const std::system_error&) {
                break;  // thread creation failed: finish serially
            }
            unstarted = r1;
        }
        for (auto& th : pool) th.join();
        if (unstarted < n_rows) worker(unstarted, n_rows);
    }

    // string-column extraction over the already-collected line spans:
    // serial (variable-length appends don't parallelize without an offsets
    // pre-pass, and the walk stops at the column anyway — for data_dir at
    // index ~17 of 984 that's a few hundred bytes per row)
    if (str_col >= 0) {
        if (str_col >= total_cols) {
            unmap(m);
            return -2;
        }
        long written = 0;
        for (long r = 0; r < n_rows; ++r) {
            size_t fs = lines[r].first;
            const size_t re = lines[r].second;
            int col = 0;
            while (col < str_col) {
                const void* nx = (fs <= re)
                    ? ::memchr(m.data + fs, ',', re - fs)
                    : nullptr;
                if (!nx) break;
                fs = static_cast<size_t>(static_cast<const char*>(nx)
                                         - m.data) + 1;
                ++col;
            }
            if (col != str_col) {
                unmap(m);
                return -2;  // short row
            }
            const void* nx = ::memchr(m.data + fs, ',', re - fs);
            size_t fe = nx ? static_cast<size_t>(
                                 static_cast<const char*>(nx) - m.data)
                           : re;
            long need = static_cast<long>(fe - fs) + (r > 0 ? 1 : 0);
            if (written + need > str_cap) {
                unmap(m);
                return -3;
            }
            if (r > 0) str_out[written++] = '\n';
            ::memcpy(str_out + written, m.data + fs, fe - fs);
            written += static_cast<long>(fe - fs);
        }
        if (str_written) *str_written = written;
    }

    unmap(m);
    return n_rows;
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
    return read_selected<float>(path, sel, n_sel, out, max_rows);
}

// float64 variant: used for the light-column frame, where values must
// carry pandas-equivalent (double) precision before any later narrowing.
long fast_csv_read_f64(const char* path, const int32_t* sel, int n_sel,
                       double* out, long max_rows) {
    return read_selected<double>(path, sel, n_sel, out, max_rows);
}

// one-pass light-frame read: numeric columns into out (f64) AND the
// str_col column's raw text '\n'-joined into str_out, in a single
// mmap/scan.  Returns rows parsed (with *str_written set), or <0:
// -1 unreadable, -2 bad column/short row, -3 str buffer too small,
// -4 ragged first/last row, -5 quoted cells (use pandas).
long fast_csv_read_light(const char* path, const int32_t* sel, int n_sel,
                         double* out, long max_rows, int32_t str_col,
                         char* str_out, long str_cap, long* str_written) {
    return read_selected<double>(path, sel, n_sel, out, max_rows, str_col,
                                 str_out, str_cap, str_written);
}

// Extract ONE column's raw text values, '\n'-joined, into out (cap bytes,
// NOT NUL-terminated).  Returns bytes written, or <0 on error
// (-1 unreadable, -5 quoted cells, -2 bad column, -3 buffer too small).
long fast_csv_read_col_str(const char* path, int32_t col_idx,
                           char* out, long cap) {
    Mapped m = map_file(path);
    if (!m.ok()) return -1;
    if (has_quotes(m.data, m.size)) {
        unmap(m);
        return -5;
    }
    size_t hdr_end = line_end(m.data, m.size, 0);
    int total_cols = count_columns(m.data, hdr_end);
    if (col_idx < 0 || col_idx >= total_cols) {
        unmap(m);
        return -2;
    }
    long written = 0;
    size_t pos = hdr_end + 1;
    bool first = true;
    while (pos < m.size) {
        size_t e = line_end(m.data, m.size, pos);
        size_t real_end = e;
        if (real_end > pos && m.data[real_end - 1] == '\r') --real_end;
        if (real_end > pos) {
            // locate the col_idx-th field
            size_t fs = pos, fe = real_end;
            int col = 0;
            for (size_t i = pos; i < real_end && col < col_idx; ++i) {
                if (m.data[i] == ',') {
                    ++col;
                    fs = i + 1;
                }
            }
            if (col != col_idx) {
                unmap(m);
                return -2;  // short row
            }
            const void* next = ::memchr(m.data + fs, ',', real_end - fs);
            fe = next ? static_cast<size_t>(static_cast<const char*>(next) -
                                            m.data)
                      : real_end;
            long need = static_cast<long>(fe - fs) + (first ? 0 : 1);
            if (written + need > cap) {
                unmap(m);
                return -3;
            }
            if (!first) out[written++] = '\n';
            ::memcpy(out + written, m.data + fs, fe - fs);
            written += static_cast<long>(fe - fs);
            first = false;
        }
        pos = e + 1;
    }
    unmap(m);
    return written;
}

}  // extern "C"
