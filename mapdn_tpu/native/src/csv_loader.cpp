// Native CSV time-series loader.
//
// C++ equivalent of the reference's pandas CSV ingestion of the 3-minute
// PV/load histories (reference voltage_control_env.py:407-438): ~500k-row
// numeric tables parsed with a single-pass strtod scanner instead of the
// pandas tokenizer.  Layout contract matches the MAPDN dataset: one header
// line, each row "<timestamp>,<v1>,<v2>,...", the first column discarded.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Probe pass: returns 0 on success and fills *rows (data rows) and *cols
// (numeric columns, first column excluded).  Negative on error.
int mapdn_csv_probe(const char* path, int64_t* rows, int64_t* cols) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    std::vector<char> buf(1 << 20);
    int64_t nrows = -1;  // header does not count
    int64_t ncols = 0;
    while (std::fgets(buf.data(), (int)buf.size(), fp)) {
        size_t len = std::strlen(buf.data());
        bool eol = len > 0 && buf[len - 1] == '\n';
        if (nrows == 0 && ncols == 0) {  // first data line: count commas
            for (size_t i = 0; i < len; ++i) ncols += buf[i] == ',';
        }
        if (eol || std::feof(fp)) ++nrows;
        // long lines: keep reading until the newline without recounting
        while (!eol && std::fgets(buf.data(), (int)buf.size(), fp)) {
            len = std::strlen(buf.data());
            eol = len > 0 && buf[len - 1] == '\n';
            if (eol || std::feof(fp)) ++nrows;
        }
    }
    std::fclose(fp);
    if (nrows <= 0 || ncols <= 0) return -2;
    *rows = nrows;
    *cols = ncols;
    return 0;
}

// Fill pass: parses into out (rows*cols, row-major), scaling every value.
// Returns number of rows parsed, negative on error.
int64_t mapdn_csv_load(const char* path, double* out, int64_t rows,
                       int64_t cols, double scale) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    std::fseek(fp, 0, SEEK_END);
    long fsize = std::ftell(fp);
    std::fseek(fp, 0, SEEK_SET);
    std::vector<char> data((size_t)fsize + 1);
    if (std::fread(data.data(), 1, (size_t)fsize, fp) != (size_t)fsize) {
        std::fclose(fp);
        return -2;
    }
    std::fclose(fp);
    data[fsize] = '\0';

    char* s = data.data();
    char* end = s + fsize;
    // skip header line
    while (s < end && *s != '\n') ++s;
    if (s < end) ++s;

    int64_t r = 0;
    while (s < end && r < rows) {
        // skip first (timestamp/index) column
        while (s < end && *s != ',' && *s != '\n') ++s;
        if (s >= end || *s == '\n') { if (s < end) ++s; continue; }
        ++s;
        double* row_out = out + r * cols;
        for (int64_t c = 0; c < cols; ++c) {
            char* next = nullptr;
            row_out[c] = std::strtod(s, &next) * scale;
            s = next;
            while (s < end && (*s == ',' || *s == ' ' || *s == '\r')) ++s;
        }
        while (s < end && *s != '\n') ++s;
        if (s < end) ++s;
        ++r;
    }
    return r;
}

}  // extern "C"
