// Fast whitespace-separated numeric parsing for the legacy-VTK ASCII reader.
//
// Native runtime component of pyfocusr_tpu: the reference's mesh I/O is the
// VTK C++ library (vtk_functions.py:5-9); ours is a dependency-free parser
// whose hot inner loop (tokenizing megabytes of ASCII floats) lives here.
// C ABI + ctypes; pure-numpy fallback in pyfocusr_tpu/io/vtk_io.py.

#include <cstdint>
#include <cstdlib>

extern "C" {

// Parse up to max_out whitespace-separated doubles from buf[0:len).
// Returns the number parsed; *consumed gets the byte offset after the last
// parsed token (so callers can resume section-by-section).
int64_t parse_doubles(const char* buf, int64_t len, double* out,
                      int64_t max_out, int64_t* consumed) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t n = 0;
    while (n < max_out) {
        // strtod skips leading whitespace itself, but stop at 'end'.
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        double val = std::strtod(p, &next);
        if (next == p) break;  // non-numeric token
        out[n++] = val;
        p = next;
    }
    if (consumed) *consumed = p - buf;
    return n;
}

// Same for int64 connectivity streams.
int64_t parse_longs(const char* buf, int64_t len, int64_t* out,
                    int64_t max_out, int64_t* consumed) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t n = 0;
    while (n < max_out) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        long long val = std::strtoll(p, &next, 10);
        if (next == p) break;
        out[n++] = (int64_t)val;
        p = next;
    }
    if (consumed) *consumed = p - buf;
    return n;
}

}  // extern "C"
