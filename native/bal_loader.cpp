// Fast BAL (Bundle Adjustment in the Large) text-format parser.
//
// The framework's native data-loader component: BAL files at Venice/Final
// scale hold tens of millions of whitespace-separated numbers; this mmap +
// strtod single-pass parser tokenizes them at memory bandwidth, feeding the
// bulk problem-ingestion APIs (nllstpu/models/bal.py) without Python-side
// tokenization.  Exposed to Python through ctypes (nllstpu/utils/native.py),
// with a numpy fallback when the shared library is not built.
//
// Build: make -C native   (or it is auto-built on first use)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    data = static_cast<const char*>(
        mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    return data != MAP_FAILED;
  }

  ~Mapped() {
    if (data && data != MAP_FAILED) munmap(const_cast<char*>(data), size);
    if (fd >= 0) close(fd);
  }
};

inline double next_double(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
  char* q;
  double v = strtod(p, &q);
  p = q;
  return v;
}

inline long next_long(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t')) ++p;
  char* q;
  long v = strtol(p, &q, 10);
  p = q;
  return v;
}

}  // namespace

extern "C" {

// Read only the header: number of cameras, points, observations.
int bal_sizes(const char* path, int64_t* ncam, int64_t* npt, int64_t* nobs) {
  Mapped m;
  if (!m.open(path)) return 1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  *ncam = next_long(p, end);
  *npt = next_long(p, end);
  *nobs = next_long(p, end);
  return (*ncam > 0 && *npt > 0 && *nobs > 0) ? 0 : 2;
}

// Full parse into caller-allocated buffers:
//   cam_idx[nobs], pt_idx[nobs]  (int32)
//   obs[nobs*2], cams[ncam*9], pts[npt*3]  (float64)
int bal_parse(const char* path, int32_t* cam_idx, int32_t* pt_idx, double* obs,
              double* cams, double* pts) {
  Mapped m;
  if (!m.open(path)) return 1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  const long ncam = next_long(p, end);
  const long npt = next_long(p, end);
  const long nobs = next_long(p, end);
  if (ncam <= 0 || npt <= 0 || nobs <= 0) return 2;
  for (long i = 0; i < nobs; ++i) {
    cam_idx[i] = static_cast<int32_t>(next_long(p, end));
    pt_idx[i] = static_cast<int32_t>(next_long(p, end));
    obs[2 * i] = next_double(p, end);
    obs[2 * i + 1] = next_double(p, end);
  }
  for (long i = 0; i < ncam * 9; ++i) cams[i] = next_double(p, end);
  for (long i = 0; i < npt * 3; ++i) pts[i] = next_double(p, end);
  return (p <= end) ? 0 : 3;
}

}  // extern "C"
