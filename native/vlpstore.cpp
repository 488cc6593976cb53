// vlpstore — packed region-feature store for the VLP-TPU data pipeline.
//
// Native replacement for the reference's per-example HDF5 reads
// (/root/reference/vlp/seq2seq_loader.py:325-336 opens three .h5 files per
// example inside DataLoader workers; the reference README notes data loading
// as the eval bottleneck).  Records are packed once into a single
// memory-mapped file with an open-addressed key index; batched gathers fan
// out over a thread pool and write straight into caller-provided pinned
// buffers.
//
// File layout (little endian):
//   [0]    header: magic 'VLPS', u32 version, u64 n_records,
//          u32 n_regions, u32 feat_dim, u32 cls_dim, u32 bbox_dim,
//          u32 key_len, u32 dtype (version 1 wrote 0 here as padding;
//          0 = float32, 1 = float16)
//   [40]   index: n_slots * { char key[key_len] (zero padded) }
//          where n_slots == n_records (record i owns index slot i)
//   [...]  records: n_records * { feat[n_regions*feat_dim],
//                                 cls[n_regions*cls_dim],
//                                 bbox[n_regions*bbox_dim] } in `dtype`
//
// Version 2 adds float16 records: the host pipeline is memory-bandwidth
// bound (≈2.9 MB moved per example at fp32), so halving the element size
// roughly doubles loader throughput and host→device transfer rate.
// Featurization math (layer norms) always runs in fp32 internally.
//
// Version 3 stores the featurization PRECOMPUTED: records are
//   { feat[n_regions*feat_dim], vis_pe[n_regions*(6+cls_dim)] }
// (bbox_dim is 0; cls/bbox raw arrays are not retained).  The geometry
// featurization is deterministic per record, so recomputing the layer
// norms every epoch in the gather hot path is pure waste — a v3 gather is
// two dtype-converting memcpys.  The featurize entry points below serve
// all three versions transparently.
//
// Exposed C ABI (consumed from Python via ctypes):
//   vlps_abi        — ABI level (stale-.so probe for the Python binding;
//     4 = vlps_prefetch available)
//   vlps_prefetch   — madvise(WILLNEED) readahead for a batch of records
//   vlps_open / vlps_close / vlps_meta / vlps_find
//   vlps_get        — copy one record's raw arrays (fp32 out, converts);
//     v3 files fail it when cls/bbox are requested (not stored)
//   vlps_batch_get  — threaded gather of many records (fp32 out)
//   vlps_batch_featurize   — gather + geometry featurization fused in C++
//     (bbox+cls -> 1607-dim vis_pe exactly as seq2seq_loader.py:338-351),
//     fp32 outputs; for v3 files a pure copy of the stored vis_pe
//   vlps_batch_featurize16 — same, float16 outputs (feat is a straight
//     memcpy when the store is float16)

#include <atomic>
#include <functional>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#if defined(__F16C__)
#include <immintrin.h>
#endif

namespace {

struct Header {
  char magic[4];
  uint32_t version;
  uint64_t n_records;
  uint32_t n_regions;
  uint32_t feat_dim;
  uint32_t cls_dim;
  uint32_t bbox_dim;
  uint32_t key_len;
  uint32_t dtype;  // 0 = float32, 1 = float16 (version 1 files wrote 0)
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  const char* keys = nullptr;       // n_records * key_len
  const uint8_t* records = nullptr; // packed elements
  size_t elem = 4;                  // bytes per element
  size_t record_bytes = 0;
  std::unordered_map<std::string, uint64_t> index;
};

inline const uint8_t* record_ptr(const Store* s, uint64_t i) {
  return s->records + i * s->record_bytes;
}

// ---------------------------------------------------------------- fp16 <-> fp32

#if defined(__F16C__)

void half_to_float(const uint16_t* src, float* dst, size_t n) {
  size_t i = 0;
  for (; i + 8 <= n; i += 8)
    _mm256_storeu_ps(dst + i, _mm256_cvtph_ps(_mm_loadu_si128(
        reinterpret_cast<const __m128i*>(src + i))));
  for (; i < n; ++i) dst[i] = _cvtsh_ss(src[i]);
}

void float_to_half(const float* src, uint16_t* dst, size_t n) {
  size_t i = 0;
  for (; i + 8 <= n; i += 8)
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + i),
                     _mm256_cvtps_ph(_mm256_loadu_ps(src + i),
                                     _MM_FROUND_TO_NEAREST_INT));
  for (; i < n; ++i)
    dst[i] = _cvtss_sh(src[i], _MM_FROUND_TO_NEAREST_INT);
}

#else  // portable software conversion (round-to-nearest-even)

float half_to_float_1(uint16_t h) {
  const uint32_t sign = static_cast<uint32_t>(h & 0x8000u) << 16;
  const uint32_t exp = (h >> 10) & 0x1f;
  const uint32_t man = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalise
      int e = -1;
      uint32_t m = man;
      do {
        ++e;
        m <<= 1;
      } while ((m & 0x400u) == 0);
      bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3ffu) << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | (man << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

uint16_t float_to_half_1(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  const uint16_t sign = static_cast<uint16_t>((x >> 16) & 0x8000u);
  x &= 0x7fffffffu;
  if (x >= 0x7f800000u)  // inf/nan
    return sign | 0x7c00u | (x > 0x7f800000u ? 0x200u : 0u);
  if (x >= 0x477ff000u) return sign | 0x7c00u;  // overflow -> inf
  if (x < 0x38800000u) {                        // subnormal half
    const uint32_t shift = 126 - (x >> 23);
    if (shift > 24) return sign;
    uint32_t m = (x & 0x7fffffu) | 0x800000u;
    uint16_t h = static_cast<uint16_t>(m >> (shift + 1));
    const uint32_t rem = m & ((1u << (shift + 1)) - 1);
    const uint32_t half = 1u << shift;
    if (rem > half || (rem == half && (h & 1u))) ++h;
    return sign | h;
  }
  uint16_t h = static_cast<uint16_t>(
      ((x >> 23) - 127 + 15) << 10 | ((x >> 13) & 0x3ffu));
  const uint32_t rem = x & 0x1fffu;
  if (rem > 0x1000u || (rem == 0x1000u && (h & 1u))) ++h;
  return sign | h;
}

void half_to_float(const uint16_t* src, float* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) dst[i] = half_to_float_1(src[i]);
}

void float_to_half(const float* src, uint16_t* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) dst[i] = float_to_half_1(src[i]);
}

#endif

// copy n elements from store dtype to fp32
inline void load_f32(const Store* s, const uint8_t* src, float* dst,
                     size_t n) {
  if (s->elem == 4)
    std::memcpy(dst, src, n * 4);
  else
    half_to_float(reinterpret_cast<const uint16_t*>(src), dst, n);
}

void layer_norm_row(const float* x, float* out, int n) {
  // parameter-free layer norm, eps 1e-5 (torch F.layer_norm default)
  double mean = 0.0;
  for (int i = 0; i < n; ++i) mean += x[i];
  mean /= n;
  double var = 0.0;
  for (int i = 0; i < n; ++i) {
    const double d = x[i] - mean;
    var += d * d;
  }
  var /= n;
  const float inv = 1.0f / std::sqrt(static_cast<float>(var) + 1e-5f);
  for (int i = 0; i < n; ++i)
    out[i] = (x[i] - static_cast<float>(mean)) * inv;
}

// geometry featurization (seq2seq_loader.py:338-351): normalise coords by
// max extent, insert clamped relative area at slot 4, keep confidence slot 5,
// LN(6-geom) ++ LN(cls) -> [n_regions, 6 + cls_dim] in `out_half` precision.
// LN math is fp32 regardless of the store/output dtypes.
void featurize_record(const Store* s, const uint8_t* rec, uint8_t* pe_out,
                      bool out_half) {
  const int nr = s->hdr.n_regions;
  const int cd = s->hdr.cls_dim;
  const int bd = s->hdr.bbox_dim;
  const size_t nf = static_cast<size_t>(nr) * s->hdr.feat_dim;
  const uint8_t* cls = rec + nf * s->elem;
  const uint8_t* bbox = cls + static_cast<size_t>(nr) * cd * s->elem;

  thread_local std::vector<float> bboxf, clsf, rowf;
  bboxf.resize(static_cast<size_t>(nr) * bd);
  load_f32(s, bbox, bboxf.data(), static_cast<size_t>(nr) * bd);

  float w_est = 0.f, h_est = 0.f;
  for (int r = 0; r < nr; ++r) {
    const float* b = bboxf.data() + r * bd;
    w_est = std::max(w_est, std::max(b[0], b[2]));
    h_est = std::max(h_est, std::max(b[1], b[3]));
  }
  w_est += 1e-5f;
  h_est += 1e-5f;

  const int out_dim = 6 + cd;
  rowf.resize(out_dim);
  clsf.resize(cd);
  float geom[6];
  for (int r = 0; r < nr; ++r) {
    const float* b = bboxf.data() + r * bd;
    const float x1 = b[0] / w_est, y1 = b[1] / h_est;
    const float x2 = b[2] / w_est, y2 = b[3] / h_est;
    float area = (y2 - y1) * (x2 - x1);
    if (area < 0.f) area = 0.f;
    geom[0] = x1; geom[1] = y1; geom[2] = x2; geom[3] = y2;
    geom[4] = area;
    geom[5] = bd > 5 ? b[5] : 0.f;

    const float* crow;
    if (s->elem == 4) {
      crow = reinterpret_cast<const float*>(cls) + static_cast<size_t>(r) * cd;
    } else {
      half_to_float(reinterpret_cast<const uint16_t*>(cls) +
                        static_cast<size_t>(r) * cd,
                    clsf.data(), cd);
      crow = clsf.data();
    }

    if (out_half) {
      layer_norm_row(geom, rowf.data(), 6);
      layer_norm_row(crow, rowf.data() + 6, cd);
      float_to_half(rowf.data(),
                    reinterpret_cast<uint16_t*>(pe_out) +
                        static_cast<size_t>(r) * out_dim,
                    out_dim);
    } else {
      float* o = reinterpret_cast<float*>(pe_out) +
                 static_cast<size_t>(r) * out_dim;
      layer_norm_row(geom, o, 6);
      layer_norm_row(crow, o + 6, cd);
    }
  }
}

// span copy with dtype conversion as needed (store dtype -> out dtype)
void copy_span(const Store* s, const uint8_t* src, uint8_t* out, size_t n,
               bool out_half) {
  const bool in_half = s->elem == 2;
  if (in_half == out_half)
    std::memcpy(out, src, n * s->elem);
  else if (out_half)
    float_to_half(reinterpret_cast<const float*>(src),
                  reinterpret_cast<uint16_t*>(out), n);
  else
    half_to_float(reinterpret_cast<const uint16_t*>(src),
                  reinterpret_cast<float*>(out), n);
}

void copy_feat(const Store* s, const uint8_t* rec, uint8_t* out,
               bool out_half) {
  copy_span(s, rec, out,
            static_cast<size_t>(s->hdr.n_regions) * s->hdr.feat_dim,
            out_half);
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  const int workers = std::min(n_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&] {
      for (;;) {
        const int i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

int batch_featurize_impl(void* handle, const int64_t* indices, int n,
                         uint8_t* feat, uint8_t* vis_pe, int n_threads,
                         bool out_half) {
  auto* s = static_cast<Store*>(handle);
  const size_t nf = static_cast<size_t>(s->hdr.n_regions) * s->hdr.feat_dim;
  const size_t pe_n = static_cast<size_t>(s->hdr.n_regions) *
                      (6 + s->hdr.cls_dim);
  const size_t out_elem = out_half ? 2 : 4;
  const bool precomputed = s->hdr.version == 3;
  std::atomic<int> bad{0};
  parallel_for(n, n_threads, [&](int j) {
    const int64_t i = indices[j];
    if (i < 0 || static_cast<uint64_t>(i) >= s->hdr.n_records) {
      bad.store(1);
      return;
    }
    const uint8_t* r = record_ptr(s, i);
    if (feat) copy_feat(s, r, feat + j * nf * out_elem, out_half);
    if (precomputed)
      copy_span(s, r + nf * s->elem, vis_pe + j * pe_n * out_elem, pe_n,
                out_half);
    else
      featurize_record(s, r, vis_pe + j * pe_n * out_elem, out_half);
  });
  return bad.load() ? -1 : 0;
}

}  // namespace

extern "C" {

// ABI level: the Python binding probes this to detect a stale prebuilt .so
// (3 = v3 precomputed-featurization files supported).
int vlps_abi(void) { return 4; }

// Advise the kernel to read the given records ahead (posix_madvise
// WILLNEED on each record's span).  Production stores are TB-scale and
// disk-backed; issuing this for batch i+1 before gathering batch i lets
// the page cache fill during the current gather+build instead of
// faulting inside it.  Unknown indices (-1) are skipped; returns 0.
int vlps_prefetch(void* handle, const int64_t* indices, int n) {
  auto* s = static_cast<Store*>(handle);
  const size_t page = static_cast<size_t>(sysconf(_SC_PAGESIZE));
  for (int j = 0; j < n; ++j) {
    const int64_t i = indices[j];
    if (i < 0 || static_cast<uint64_t>(i) >= s->hdr.n_records) continue;
    const uint8_t* r = record_ptr(s, i);
    // madvise needs a page-aligned start
    auto addr = reinterpret_cast<uintptr_t>(r);
    const uintptr_t aligned = addr & ~(page - 1);
    posix_madvise(reinterpret_cast<void*>(aligned),
                  s->record_bytes + (addr - aligned), POSIX_MADV_WILLNEED);
  }
  return 0;
}

void* vlps_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;
  std::memcpy(&s->hdr, s->base, sizeof(Header));
  const bool ok = std::memcmp(s->hdr.magic, "VLPS", 4) == 0 &&
                  s->hdr.version >= 1 && s->hdr.version <= 3 &&
                  s->hdr.dtype <= 1;
  if (!ok) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->elem = s->hdr.dtype == 1 ? 2 : 4;
  s->keys = reinterpret_cast<const char*>(s->base + sizeof(Header));
  const size_t index_bytes =
      static_cast<size_t>(s->hdr.n_records) * s->hdr.key_len;
  s->records = s->base + sizeof(Header) + index_bytes;
  // v1/v2 records: {feat, cls, bbox}; v3: {feat, vis_pe[6+cls_dim]}
  s->record_bytes =
      s->elem * s->hdr.n_regions *
      (s->hdr.version == 3
           ? s->hdr.feat_dim + 6 + s->hdr.cls_dim
           : s->hdr.feat_dim + s->hdr.cls_dim + s->hdr.bbox_dim);
  s->index.reserve(s->hdr.n_records * 2);
  for (uint64_t i = 0; i < s->hdr.n_records; ++i) {
    const char* k = s->keys + i * s->hdr.key_len;
    s->index.emplace(std::string(k, strnlen(k, s->hdr.key_len)), i);
  }
  return s;
}

void vlps_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

// meta out: [n_records, n_regions, feat_dim, cls_dim, bbox_dim, key_len,
//            dtype]
void vlps_meta(void* handle, uint64_t* out) {
  auto* s = static_cast<Store*>(handle);
  out[0] = s->hdr.n_records;
  out[1] = s->hdr.n_regions;
  out[2] = s->hdr.feat_dim;
  out[3] = s->hdr.cls_dim;
  out[4] = s->hdr.bbox_dim;
  out[5] = s->hdr.key_len;
  out[6] = s->hdr.dtype;
}

int64_t vlps_find(void* handle, const char* key) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  return it == s->index.end() ? -1 : static_cast<int64_t>(it->second);
}

// fp32 outputs regardless of store dtype (converts from fp16 when needed).
// v3 files do not retain cls/bbox: requesting them returns -2.
int vlps_get(void* handle, const char* key, float* feat, float* cls,
             float* bbox) {
  auto* s = static_cast<Store*>(handle);
  if (s->hdr.version == 3 && (cls || bbox)) return -2;
  const int64_t i = vlps_find(handle, key);
  if (i < 0) return -1;
  const uint8_t* r = record_ptr(s, i);
  const size_t nf = static_cast<size_t>(s->hdr.n_regions) * s->hdr.feat_dim;
  const size_t nc = static_cast<size_t>(s->hdr.n_regions) * s->hdr.cls_dim;
  const size_t nb = static_cast<size_t>(s->hdr.n_regions) * s->hdr.bbox_dim;
  if (feat) load_f32(s, r, feat, nf);
  if (cls) load_f32(s, r + nf * s->elem, cls, nc);
  if (bbox) load_f32(s, r + (nf + nc) * s->elem, bbox, nb);
  return 0;
}

// indices: int64[n]; feat out: [n, n_regions*feat_dim] contiguous (etc.)
// v3 files do not retain cls/bbox: requesting them returns -2.
int vlps_batch_get(void* handle, const int64_t* indices, int n, float* feat,
                   float* cls, float* bbox, int n_threads) {
  auto* s = static_cast<Store*>(handle);
  if (s->hdr.version == 3 && (cls || bbox)) return -2;
  const size_t nf = static_cast<size_t>(s->hdr.n_regions) * s->hdr.feat_dim;
  const size_t nc = static_cast<size_t>(s->hdr.n_regions) * s->hdr.cls_dim;
  const size_t nb = static_cast<size_t>(s->hdr.n_regions) * s->hdr.bbox_dim;
  std::atomic<int> bad{0};
  parallel_for(n, n_threads, [&](int j) {
    const int64_t i = indices[j];
    if (i < 0 || static_cast<uint64_t>(i) >= s->hdr.n_records) {
      bad.store(1);
      return;
    }
    const uint8_t* r = record_ptr(s, i);
    if (feat) load_f32(s, r, feat + j * nf, nf);
    if (cls) load_f32(s, r + nf * s->elem, cls + j * nc, nc);
    if (bbox) load_f32(s, r + (nf + nc) * s->elem, bbox + j * nb, nb);
  });
  return bad.load() ? -1 : 0;
}

// gather + fused featurization: feat out [n, n_regions*feat_dim],
// vis_pe out [n, n_regions*(6+cls_dim)] — fp32 outputs
int vlps_batch_featurize(void* handle, const int64_t* indices, int n,
                         float* feat, float* vis_pe, int n_threads) {
  return batch_featurize_impl(handle, indices, n,
                              reinterpret_cast<uint8_t*>(feat),
                              reinterpret_cast<uint8_t*>(vis_pe), n_threads,
                              /*out_half=*/false);
}

// same with float16 outputs (buffers are uint16 bit patterns)
int vlps_batch_featurize16(void* handle, const int64_t* indices, int n,
                           uint16_t* feat, uint16_t* vis_pe, int n_threads) {
  return batch_featurize_impl(handle, indices, n,
                              reinterpret_cast<uint8_t*>(feat),
                              reinterpret_cast<uint8_t*>(vis_pe), n_threads,
                              /*out_half=*/true);
}

}  // extern "C"
