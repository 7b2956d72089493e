// Fast SDPA sparse-format (.dat-s) tokenizer.
//
// Native counterpart of hdsdp_tpu/io/sdpa.py (semantics follow the
// reference reader HReadSDPA, ref interface/hdsdp_file_io.c:34-381, but
// this is a from-scratch implementation): mmap-free single-pass parse of
// header + COO body with strtod/strtol, tiny-entry filtering at 1e-12
// (ref hdsdp_file_io.c:224-230).  Exported through a C ABI consumed by
// hdsdp_tpu/native/sdpa_native.py via ctypes.
//
// Build: see build.sh (g++ -O2 -shared -fPIC).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr double kTinyEntry = 1e-12;

struct SdpaFile {
  int32_t m = 0;
  std::vector<int32_t> dims;  // as written: negative = LP block
  std::vector<double> b;
  std::vector<int32_t> con, blk, row, col;
  std::vector<double> val;
};

// Advance p past whitespace and separator punctuation used in SDPA headers.
inline const char* skip_seps(const char* p, const char* end) {
  while (p < end &&
         (std::isspace(static_cast<unsigned char>(*p)) || *p == ',' ||
          *p == '{' || *p == '}' || *p == '(' || *p == ')' || *p == '\''))
    ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

bool parse_longs(const char*& p, const char* end, int64_t* out, int n) {
  for (int i = 0; i < n; ++i) {
    p = skip_seps(p, end);
    char* q = nullptr;
    long long v = std::strtoll(p, &q, 10);
    if (q == p) return false;
    out[i] = v;
    p = q;
  }
  return true;
}

SdpaFile* parse(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  const char* p = buf.data();
  const char* end = p + buf.size();

  // comment lines begin with '*' or '"'
  while (p < end) {
    const char* q = p;
    while (q < end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
    if (q < end && (*q == '*' || *q == '"' || *q == '\n')) {
      p = next_line(p, end);
    } else {
      break;
    }
  }

  auto file = new SdpaFile();
  int64_t tmp;
  if (!parse_longs(p, end, &tmp, 1)) {
    delete file;
    return nullptr;
  }
  file->m = static_cast<int32_t>(tmp);
  p = next_line(p, end);

  if (!parse_longs(p, end, &tmp, 1)) {
    delete file;
    return nullptr;
  }
  int32_t nblocks = static_cast<int32_t>(tmp);
  p = next_line(p, end);

  file->dims.resize(nblocks);
  for (int i = 0; i < nblocks; ++i) {
    p = skip_seps(p, end);
    char* q = nullptr;
    double v = std::strtod(p, &q);  // tolerate "3.0" style dims
    if (q == p) {
      delete file;
      return nullptr;
    }
    file->dims[i] = static_cast<int32_t>(v);
    p = q;
  }

  file->b.resize(file->m);
  for (int i = 0; i < file->m; ++i) {
    p = skip_seps(p, end);
    char* q = nullptr;
    double v = std::strtod(p, &q);
    if (q == p) {
      delete file;
      return nullptr;
    }
    file->b[i] = v;
    p = q;
  }

  // entry body: <con> <blk> <i> <j> <val>, 1-based blk/i/j
  size_t guess = buf.size() / 24 + 16;
  file->con.reserve(guess);
  file->blk.reserve(guess);
  file->row.reserve(guess);
  file->col.reserve(guess);
  file->val.reserve(guess);
  while (p < end) {
    p = skip_seps(p, end);
    if (p >= end) break;
    if (!std::isdigit(static_cast<unsigned char>(*p)) && *p != '-' &&
        *p != '+') {
      // trailing comment section (e.g. BEGIN.COMMENT): stop
      break;
    }
    int64_t ints[4];
    if (!parse_longs(p, end, ints, 4)) break;
    p = skip_seps(p, end);
    char* q = nullptr;
    double v = std::strtod(p, &q);
    if (q == p) break;
    p = q;
    if (v < kTinyEntry && v > -kTinyEntry) continue;
    file->con.push_back(static_cast<int32_t>(ints[0]));
    file->blk.push_back(static_cast<int32_t>(ints[1] - 1));
    file->row.push_back(static_cast<int32_t>(ints[2] - 1));
    file->col.push_back(static_cast<int32_t>(ints[3] - 1));
    file->val.push_back(v);
  }
  return file;
}

}  // namespace

extern "C" {

void* hdsdp_sdpa_parse(const char* path) { return parse(path); }

int32_t hdsdp_sdpa_m(void* h) { return static_cast<SdpaFile*>(h)->m; }

int32_t hdsdp_sdpa_nblocks(void* h) {
  return static_cast<int32_t>(static_cast<SdpaFile*>(h)->dims.size());
}

int64_t hdsdp_sdpa_nnz(void* h) {
  return static_cast<int64_t>(static_cast<SdpaFile*>(h)->val.size());
}

void hdsdp_sdpa_export(void* h, int32_t* dims, double* b, int32_t* con,
                       int32_t* blk, int32_t* row, int32_t* col, double* val) {
  auto* f = static_cast<SdpaFile*>(h);
  std::memcpy(dims, f->dims.data(), f->dims.size() * sizeof(int32_t));
  std::memcpy(b, f->b.data(), f->b.size() * sizeof(double));
  std::memcpy(con, f->con.data(), f->con.size() * sizeof(int32_t));
  std::memcpy(blk, f->blk.data(), f->blk.size() * sizeof(int32_t));
  std::memcpy(row, f->row.data(), f->row.size() * sizeof(int32_t));
  std::memcpy(col, f->col.data(), f->col.size() * sizeof(int32_t));
  std::memcpy(val, f->val.data(), f->val.size() * sizeof(double));
}

void hdsdp_sdpa_free(void* h) { delete static_cast<SdpaFile*>(h); }

}  // extern "C"
