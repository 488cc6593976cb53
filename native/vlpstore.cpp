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
//          u32 key_len, u32 pad
//   [40]   index: n_slots * { char key[key_len] (zero padded) }
//          where n_slots == n_records (record i owns index slot i)
//   [...]  records: n_records * { f32 feat[n_regions*feat_dim],
//                                 f32 cls[n_regions*cls_dim],
//                                 f32 bbox[n_regions*bbox_dim] }
//
// Exposed C ABI (consumed from Python via ctypes):
//   vlps_open / vlps_close / vlps_meta / vlps_find
//   vlps_get        — copy one record's raw arrays
//   vlps_batch_get  — threaded gather of many records
//   vlps_batch_featurize — gather + geometry featurization fused in C++
//     (bbox+cls -> 1607-dim vis_pe exactly as seq2seq_loader.py:338-351)

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
  uint32_t pad;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  Header hdr{};
  const char* keys = nullptr;       // n_records * key_len
  const uint8_t* records = nullptr; // packed floats
  size_t record_bytes = 0;
  std::unordered_map<std::string, uint64_t> index;
};

inline const float* record_ptr(const Store* s, uint64_t i) {
  return reinterpret_cast<const float*>(s->records + i * s->record_bytes);
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
// LN(6-geom) ++ LN(cls) -> out [n_regions, 6 + cls_dim]
void featurize(const float* bbox, const float* cls, float* out,
               int n_regions, int bbox_dim, int cls_dim) {
  float w_est = 0.f, h_est = 0.f;
  for (int r = 0; r < n_regions; ++r) {
    const float* b = bbox + r * bbox_dim;
    w_est = std::max(w_est, std::max(b[0], b[2]));
    h_est = std::max(h_est, std::max(b[1], b[3]));
  }
  w_est += 1e-5f;
  h_est += 1e-5f;
  const int out_dim = 6 + cls_dim;
  std::vector<float> geom(6);
  for (int r = 0; r < n_regions; ++r) {
    const float* b = bbox + r * bbox_dim;
    const float x1 = b[0] / w_est, y1 = b[1] / h_est;
    const float x2 = b[2] / w_est, y2 = b[3] / h_est;
    float area = (y2 - y1) * (x2 - x1);
    if (area < 0.f) area = 0.f;
    geom[0] = x1; geom[1] = y1; geom[2] = x2; geom[3] = y2;
    geom[4] = area;
    geom[5] = bbox_dim > 5 ? b[5] : 0.f;
    float* o = out + r * out_dim;
    layer_norm_row(geom.data(), o, 6);
    layer_norm_row(cls + r * cls_dim, o + 6, cls_dim);
  }
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

}  // namespace

extern "C" {

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
  if (std::memcmp(s->hdr.magic, "VLPS", 4) != 0 || s->hdr.version != 1) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->keys = reinterpret_cast<const char*>(s->base + sizeof(Header));
  const size_t index_bytes =
      static_cast<size_t>(s->hdr.n_records) * s->hdr.key_len;
  s->records = s->base + sizeof(Header) + index_bytes;
  s->record_bytes = sizeof(float) * s->hdr.n_regions *
                    (s->hdr.feat_dim + s->hdr.cls_dim + s->hdr.bbox_dim);
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

// meta out: [n_records, n_regions, feat_dim, cls_dim, bbox_dim, key_len]
void vlps_meta(void* handle, uint64_t* out) {
  auto* s = static_cast<Store*>(handle);
  out[0] = s->hdr.n_records;
  out[1] = s->hdr.n_regions;
  out[2] = s->hdr.feat_dim;
  out[3] = s->hdr.cls_dim;
  out[4] = s->hdr.bbox_dim;
  out[5] = s->hdr.key_len;
}

int64_t vlps_find(void* handle, const char* key) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  return it == s->index.end() ? -1 : static_cast<int64_t>(it->second);
}

int vlps_get(void* handle, const char* key, float* feat, float* cls,
             float* bbox) {
  auto* s = static_cast<Store*>(handle);
  const int64_t i = vlps_find(handle, key);
  if (i < 0) return -1;
  const float* r = record_ptr(s, i);
  const size_t nf = static_cast<size_t>(s->hdr.n_regions) * s->hdr.feat_dim;
  const size_t nc = static_cast<size_t>(s->hdr.n_regions) * s->hdr.cls_dim;
  const size_t nb = static_cast<size_t>(s->hdr.n_regions) * s->hdr.bbox_dim;
  if (feat) std::memcpy(feat, r, nf * sizeof(float));
  if (cls) std::memcpy(cls, r + nf, nc * sizeof(float));
  if (bbox) std::memcpy(bbox, r + nf + nc, nb * sizeof(float));
  return 0;
}

// indices: int64[n]; feat out: [n, n_regions*feat_dim] contiguous (etc.)
int vlps_batch_get(void* handle, const int64_t* indices, int n, float* feat,
                   float* cls, float* bbox, int n_threads) {
  auto* s = static_cast<Store*>(handle);
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
    const float* r = record_ptr(s, i);
    if (feat) std::memcpy(feat + j * nf, r, nf * sizeof(float));
    if (cls) std::memcpy(cls + j * nc, r + nf, nc * sizeof(float));
    if (bbox) std::memcpy(bbox + j * nb, r + nf + nc, nb * sizeof(float));
  });
  return bad.load() ? -1 : 0;
}

// gather + fused featurization: feat out [n, n_regions*feat_dim],
// vis_pe out [n, n_regions*(6+cls_dim)]
int vlps_batch_featurize(void* handle, const int64_t* indices, int n,
                         float* feat, float* vis_pe, int n_threads) {
  auto* s = static_cast<Store*>(handle);
  const int nr = s->hdr.n_regions;
  const size_t nf = static_cast<size_t>(nr) * s->hdr.feat_dim;
  const size_t pe_dim = static_cast<size_t>(nr) * (6 + s->hdr.cls_dim);
  std::atomic<int> bad{0};
  parallel_for(n, n_threads, [&](int j) {
    const int64_t i = indices[j];
    if (i < 0 || static_cast<uint64_t>(i) >= s->hdr.n_records) {
      bad.store(1);
      return;
    }
    const float* r = record_ptr(s, i);
    const float* cls = r + nf;
    const float* bbox = cls + static_cast<size_t>(nr) * s->hdr.cls_dim;
    if (feat) std::memcpy(feat + j * nf, r, nf * sizeof(float));
    featurize(bbox, cls, vis_pe + j * pe_dim, nr, s->hdr.bbox_dim,
              s->hdr.cls_dim);
  });
  return bad.load() ? -1 : 0;
}

}  // extern "C"
