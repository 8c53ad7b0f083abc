// Native NIfTI-1 batch reader for the NeuroViT-TPU host data pipeline.
//
// The training-loop hot path reads one (cropped, z-scored) timepoint per
// sample from large 4D NIfTI series (reference access pattern:
// DatasetADNI.py:211-213 — dataobj[1:, 10:-9, 1:, t] then normalize).
// Python-side numpy memmap slicing is adequate for one file but burns GIL
// time in stride handling and normalization at high batch rates. This module
// does the whole sample fetch in C++:
//
//   - mmap the file once (per-path handle cache with shared locking),
//   - gather the cropped sub-box of a single timepoint directly from the
//     mapped Fortran-ordered voxel data (dtype converted on the fly),
//   - z-score in place (mean/std in double, + eps),
//   - batch API fans out over a std::thread pool (no GIL).
//
// Exposed as a C ABI consumed via ctypes (neurovit_tpu/data/native_io.py).
// Uncompressed .nii only; .nii.gz falls back to the Python codec.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <thread>
#include <type_traits>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct NiftiHandle {
  void* map = nullptr;
  size_t map_size = 0;
  int64_t dims[8] = {0};
  int ndim = 0;
  int datatype = 0;
  int64_t vox_offset = 0;
  float scl_slope = 1.0f;
  float scl_inter = 0.0f;
  // Lifetime: the cache owns one reference; every in-flight read holds one
  // more. nvt_clear_cache only drops the cache's reference, so a reader
  // thread that raced past the cache lookup keeps its mmap alive until its
  // release — no use-after-free when clear runs concurrently with batch
  // reads.
  std::atomic<int> refs{1};
};

void release_handle(NiftiHandle* h) {
  if (h->refs.fetch_sub(1, std::memory_order_acq_rel) == 1) {
    munmap(h->map, h->map_size);
    delete h;
  }
}

std::shared_mutex g_cache_mu;
std::map<std::string, NiftiHandle*> g_cache;

constexpr int kDTFloat32 = 16;
constexpr int kDTFloat64 = 64;
constexpr int kDTInt16 = 4;
constexpr int kDTInt32 = 8;
constexpr int kDTUInt8 = 2;
constexpr int kDTUInt16 = 512;

size_t dtype_size(int dt) {
  switch (dt) {
    case kDTUInt8: return 1;
    case kDTInt16: case kDTUInt16: return 2;
    case kDTInt32: case kDTFloat32: return 4;
    case kDTFloat64: return 8;
    default: return 0;
  }
}

// Parse the 348-byte NIfTI-1 header (little-endian only — the practical
// case for fMRI datasets; big-endian files fall back to Python).
bool parse_header(const uint8_t* h, NiftiHandle* out) {
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, h, 4);
  if (sizeof_hdr != 348) return false;
  if (!(h[344] == 'n' && (h[345] == '+' || h[345] == 'i'))) return false;
  int16_t dim[8];
  std::memcpy(dim, h + 40, 16);
  out->ndim = dim[0];
  if (out->ndim < 3 || out->ndim > 7) return false;
  for (int i = 0; i < out->ndim; ++i) out->dims[i] = dim[i + 1];
  int16_t datatype;
  std::memcpy(&datatype, h + 70, 2);
  out->datatype = datatype;
  if (dtype_size(datatype) == 0) return false;
  float vox_offset;
  std::memcpy(&vox_offset, h + 108, 4);
  out->vox_offset = static_cast<int64_t>(vox_offset);
  std::memcpy(&out->scl_slope, h + 112, 4);
  std::memcpy(&out->scl_inter, h + 116, 4);
  return true;
}

// Returns the handle with an extra reference held for the caller (the
// increment happens under the cache lock, while the cache's own reference
// still pins the handle). Callers must release_handle() when done.
NiftiHandle* open_handle(const char* path) {
  {
    // Hot path: cached handles need only a shared (read) lock — the batch
    // reader's worker threads must not serialize on the cache.
    std::shared_lock<std::shared_mutex> rlock(g_cache_mu);
    auto it = g_cache.find(path);
    if (it != g_cache.end()) {
      it->second->refs.fetch_add(1, std::memory_order_relaxed);
      return it->second;
    }
  }
  std::unique_lock<std::shared_mutex> wlock(g_cache_mu);
  auto it = g_cache.find(path);
  if (it != g_cache.end()) {
    it->second->refs.fetch_add(1, std::memory_order_relaxed);
    return it->second;
  }

  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 352) { ::close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return nullptr;

  auto* handle = new NiftiHandle();
  handle->map = map;
  handle->map_size = st.st_size;
  if (!parse_header(static_cast<const uint8_t*>(map), handle)) {
    munmap(map, st.st_size);
    delete handle;
    return nullptr;
  }
  g_cache[path] = handle;                  // cache's reference (refs == 1)
  handle->refs.fetch_add(1, std::memory_order_relaxed);  // caller's
  return handle;
}

// Gather the cropped box from the Fortran-ordered source into a z-major
// output: out is C-ordered [Z][Y][X] (== Fortran-ordered [X][Y][Z]). The
// source is x-contiguous and so is every destination row, so the whole
// gather is sequential row copies — no transpose, no strided access; the
// Python wrapper (native_io.py) hands callers a transposed *view* with
// numpy [x][y][z] indexing for free. A tiled transposing gather into
// C-order [X][Y][Z] was measured 28% slower than numpy's strided copy;
// this layout beats it (scripts/native_io_bench.py).
// 4-way-unrolled sum/sum-of-squares over one row. Independent accumulators
// break the sequential-FP-add dependency chain (we own the summation order,
// so no -ffast-math is needed for the compiler to keep them in parallel
// registers); doubles keep 90^3-element sums exact enough for z-scoring.
inline void row_stats(const float* v, int64_t n, double* s, double* s2) {
  double a0 = 0, a1 = 0, a2 = 0, a3 = 0;
  double b0 = 0, b1 = 0, b2 = 0, b3 = 0;
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    a0 += v[i];     b0 += static_cast<double>(v[i]) * v[i];
    a1 += v[i + 1]; b1 += static_cast<double>(v[i + 1]) * v[i + 1];
    a2 += v[i + 2]; b2 += static_cast<double>(v[i + 2]) * v[i + 2];
    a3 += v[i + 3]; b3 += static_cast<double>(v[i + 3]) * v[i + 3];
  }
  for (; i < n; ++i) {
    a0 += v[i];
    b0 += static_cast<double>(v[i]) * v[i];
  }
  *s += a0 + a1 + a2 + a3;
  *s2 += b0 + b1 + b2 + b3;
}

// When `sum`/`sq` are non-null the z-score statistics are accumulated row by
// row right after each row is written (the row is L1-resident then) — one
// fewer full sweep of the ~2.9 MB sample than a separate stats pass.
template <typename T>
void gather_box(const T* vol, const int64_t* dims, const int64_t* lo,
                const int64_t* hi, float slope, float inter, float* out,
                double* sum = nullptr, double* sq = nullptr) {
  const int64_t nx = dims[0], ny = dims[1];
  const int64_t sy = nx, sz = nx * ny;
  const int64_t cx = hi[0] - lo[0], cy = hi[1] - lo[1], cz = hi[2] - lo[2];
  const bool raw_f32 = std::is_same<T, float>::value &&
                       slope == 1.0f && inter == 0.0f;
  const bool want_stats = sum != nullptr;
  if (want_stats) {
    *sum = 0.0;
    *sq = 0.0;
  }
  float* dst = out;
  for (int64_t z = 0; z < cz; ++z) {
    const T* zplane = vol + (z + lo[2]) * sz + lo[0];
    for (int64_t y = 0; y < cy; ++y) {
      const T* src = zplane + (y + lo[1]) * sy;
      if (raw_f32) {
        std::memcpy(dst, src, cx * sizeof(float));
      } else {
        for (int64_t x = 0; x < cx; ++x)
          dst[x] = static_cast<float>(src[x]) * slope + inter;
      }
      if (want_stats) row_stats(dst, cx, sum, sq);
      dst += cx;
    }
  }
}

int read_timepoint_locked(NiftiHandle* h, int64_t t,
                          int64_t x0, int64_t x1, int64_t y0, int64_t y1,
                          int64_t z0, int64_t z1, int zscore, float* out) {
  const int64_t nx = h->dims[0], ny = h->dims[1], nz = h->dims[2];
  const int64_t nt = h->ndim >= 4 ? h->dims[3] : 1;
  // Negative-from-end semantics for the crop bounds.
  if (x1 <= 0) x1 += nx;
  if (y1 <= 0) y1 += ny;
  if (z1 <= 0) z1 += nz;
  if (t < 0 || t >= nt) return -2;
  if (x0 < 0 || x1 > nx || y0 < 0 || y1 > ny || z0 < 0 || z1 > nz ||
      x0 >= x1 || y0 >= y1 || z0 >= z1)
    return -3;

  const size_t voxels_per_t = static_cast<size_t>(nx) * ny * nz;
  const size_t esize = dtype_size(h->datatype);
  const uint8_t* base = static_cast<const uint8_t*>(h->map) + h->vox_offset +
                        static_cast<size_t>(t) * voxels_per_t * esize;
  if (h->vox_offset + (t + 1) * voxels_per_t * esize > h->map_size) return -4;

  const int64_t dims3[3] = {nx, ny, nz};
  const int64_t lo[3] = {x0, y0, z0};
  const int64_t hi[3] = {x1, y1, z1};
  const int64_t n_out = (x1 - x0) * (y1 - y0) * (z1 - z0);

  const float slope = (h->scl_slope == 0.0f || h->scl_slope == 1.0f)
                          ? 1.0f : h->scl_slope;
  const float inter = (h->scl_slope == 0.0f) ? 0.0f : h->scl_inter;
  double sum = 0.0, sq = 0.0;
  double* sum_p = zscore ? &sum : nullptr;
  double* sq_p = zscore ? &sq : nullptr;
  switch (h->datatype) {
    case kDTFloat32:
      gather_box(reinterpret_cast<const float*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    case kDTFloat64:
      gather_box(reinterpret_cast<const double*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    case kDTInt16:
      gather_box(reinterpret_cast<const int16_t*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    case kDTInt32:
      gather_box(reinterpret_cast<const int32_t*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    case kDTUInt8:
      gather_box(reinterpret_cast<const uint8_t*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    case kDTUInt16:
      gather_box(reinterpret_cast<const uint16_t*>(base), dims3, lo, hi,
                 slope, inter, out, sum_p, sq_p);
      break;
    default:
      return -5;
  }

  if (zscore) {
    const double mean = sum / n_out;
    const double var = sq / n_out - mean * mean;
    const double sd = std::sqrt(var > 0 ? var : 0);
    const float denom = (zscore == 2)
        ? static_cast<float>(sd > 0 ? sd : 1.0)
        : static_cast<float>(sd + 1e-8);
    const float m = static_cast<float>(mean);
    for (int64_t i = 0; i < n_out; ++i) out[i] = (out[i] - m) / denom;
  }
  return 0;
}

}  // namespace

extern "C" {

// Read one cropped timepoint into `out` (C-order [Z, Y, X] of the cropped
// box — the caller exposes it as the [X, Y, Z] transpose view, matching
// numpy's dataobj[x0:x1, y0:y1, z0:z1, t] values with zero-copy).
// zscore: 0 = raw, 1 = (v - mean) / (std + 1e-8)  (ADNI, DatasetADNI.py:213),
//         2 = (v - mean) / (std > 0 ? std : 1)    (Pain, DatasetPain.py:192).
// Returns 0 on success, negative error codes otherwise.
int nvt_read_timepoint(const char* path, int64_t t,
                       int64_t x0, int64_t x1, int64_t y0, int64_t y1,
                       int64_t z0, int64_t z1, int zscore, float* out) {
  NiftiHandle* h = open_handle(path);  // holds a reference for this read
  if (!h) return -1;
  const int rc = read_timepoint_locked(h, t, x0, x1, y0, y1, z0, z1,
                                       zscore, out);
  release_handle(h);
  return rc;
}

// Batch fan-out over a thread pool. paths: n C-strings; out: n contiguous
// sample buffers of `sample_floats` each. Returns count of failures.
int nvt_read_batch(const char** paths, const int64_t* timepoints, int64_t n,
                   int64_t x0, int64_t x1, int64_t y0, int64_t y1,
                   int64_t z0, int64_t z1, int zscore, float* out,
                   int64_t sample_floats, int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      const int rc = nvt_read_timepoint(paths[i], timepoints[i], x0, x1, y0,
                                        y1, z0, z1, zscore,
                                        out + i * sample_floats);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  const int k = static_cast<int>(std::min<int64_t>(n_threads, n));
  pool.reserve(k);
  for (int i = 0; i < k; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Drop all cached mmaps (tests / long-running processes). Only the cache's
// reference is released: a handle still pinned by an in-flight read stays
// mapped until that reader's release_handle, then frees itself.
void nvt_clear_cache() {
  std::unique_lock<std::shared_mutex> lock(g_cache_mu);
  for (auto& kv : g_cache) release_handle(kv.second);
  g_cache.clear();
}

}  // extern "C"
