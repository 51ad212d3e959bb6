// patchstore — memory-mapped fixed-record patch database (C++).
//
// TPU-era replacement for the reference's LMDB patch databases
// (dataset/lmdb_dataset.py, util/lmdb_data.py): training patches are
// fixed-size dense arrays, so a key-value store is overkill — a flat
// mmap'd record file with a binary header gives zero-copy random reads,
// trivial crash consistency, and lets the hot uint16 -> float32 [0,1]
// conversion run multithreaded in native code instead of per-worker
// Python.
//
// File layout (<dir>/data.bin):
//   header (4096 bytes):
//     magic   "EPS1"            u32  (little endian chars)
//     dtype   code              u32  (1=u16, 2=f32, 3=u8)
//     ndim                      u32
//     reserved                  u32
//     dims[8]                   u64 each
//     count                     u64  (number of records)
//   records: count * record_bytes, tightly packed.
//
// Exposed as a C ABI for ctypes binding (eld_tpu/data/patchstore.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31535045;  // "EPS1"
constexpr size_t kHeaderBytes = 4096;

#pragma pack(push, 1)
struct Header {
  uint32_t magic;
  uint32_t dtype;
  uint32_t ndim;
  uint32_t reserved;
  uint64_t dims[8];
  uint64_t count;
};
#pragma pack(pop)

size_t dtype_size(uint32_t code) {
  switch (code) {
    case 1: return 2;  // uint16
    case 2: return 4;  // float32
    case 3: return 1;  // uint8
    default: return 0;
  }
}

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t map_bytes = 0;
  Header hdr{};
  size_t record_bytes = 0;
};

struct Writer {
  FILE* f = nullptr;
  Header hdr{};
  size_t record_bytes = 0;
  std::string path;
};

size_t record_elems(const Header& h) {
  size_t n = 1;
  for (uint32_t i = 0; i < h.ndim; ++i) n *= h.dims[i];
  return n;
}

}  // namespace

extern "C" {

void* ps_open(const char* data_bin_path) {
  int fd = ::open(data_bin_path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < kHeaderBytes) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(base, st.st_size, MADV_RANDOM);
  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->map_bytes = st.st_size;
  std::memcpy(&s->hdr, base, sizeof(Header));
  // Header sanity — all fields are file-controlled.  ndim must stay
  // within dims[8] (record_elems/ps_dims would otherwise read past the
  // struct), the element product must not overflow, and count *
  // record_bytes must fit inside the mapped file (a truncated or
  // corrupted count would otherwise SIGBUS on the first record read).
  bool ok = s->hdr.magic == kMagic && dtype_size(s->hdr.dtype) != 0 &&
            s->hdr.ndim >= 1 && s->hdr.ndim <= 8;
  uint64_t elems = 1;
  for (uint32_t i = 0; ok && i < s->hdr.ndim; ++i) {
    uint64_t d = s->hdr.dims[i];
    if (d == 0 || d > (1ull << 32) || elems > (1ull << 40) / d) ok = false;
    else elems *= d;
  }
  uint64_t rb = ok ? elems * dtype_size(s->hdr.dtype) : 0;
  if (!ok || rb == 0 ||
      s->hdr.count > ((uint64_t)st.st_size - kHeaderBytes) / rb) {
    munmap(base, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->record_bytes = (size_t)rb;
  return s;
}

uint64_t ps_count(void* h) { return static_cast<Store*>(h)->hdr.count; }
uint32_t ps_dtype(void* h) { return static_cast<Store*>(h)->hdr.dtype; }
uint32_t ps_ndim(void* h) { return static_cast<Store*>(h)->hdr.ndim; }
void ps_dims(void* h, uint64_t* out) {
  auto* s = static_cast<Store*>(h);
  std::memcpy(out, s->hdr.dims, sizeof(uint64_t) * s->hdr.ndim);
}
uint64_t ps_record_bytes(void* h) { return static_cast<Store*>(h)->record_bytes; }

// Raw record pointer (zero copy); valid until ps_close.
const void* ps_record_ptr(void* h, uint64_t idx) {
  auto* s = static_cast<Store*>(h);
  if (idx >= s->hdr.count) return nullptr;
  return s->base + kHeaderBytes + idx * s->record_bytes;
}

int ps_get(void* h, uint64_t idx, void* dst) {
  const void* p = ps_record_ptr(h, idx);
  if (!p) return -1;
  std::memcpy(dst, p, static_cast<Store*>(h)->record_bytes);
  return 0;
}

// Fetch + convert one record to float32 in [0,1] (u16/u8 scaled, f32 pass).
int ps_get_f32(void* h, uint64_t idx, float* dst) {
  auto* s = static_cast<Store*>(h);
  const void* p = ps_record_ptr(h, idx);
  if (!p) return -1;
  size_t n = record_elems(s->hdr);
  switch (s->hdr.dtype) {
    case 1: {
      const uint16_t* src = static_cast<const uint16_t*>(p);
      constexpr float k = 1.0f / 65535.0f;
      for (size_t i = 0; i < n; ++i) dst[i] = src[i] * k;
      break;
    }
    case 2:
      std::memcpy(dst, p, n * sizeof(float));
      break;
    case 3: {
      const uint8_t* src = static_cast<const uint8_t*>(p);
      constexpr float k = 1.0f / 255.0f;
      for (size_t i = 0; i < n; ++i) dst[i] = src[i] * k;
      break;
    }
    default:
      return -2;
  }
  return 0;
}

// Multithreaded batch fetch + convert: dst is (n_idx, record_elems) f32.
int ps_get_batch_f32(void* h, const uint64_t* idxs, int64_t n_idx, float* dst,
                     int n_threads) {
  auto* s = static_cast<Store*>(h);
  size_t elems = record_elems(s->hdr);
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n_idx) n_threads = (int)n_idx;
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n_idx; ++i)
      if (ps_get_f32(h, idxs[i], dst + i * elems) != 0) return -1;
    return 0;
  }
  std::atomic<int64_t> next(0);
  std::atomic<int> err(0);
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) {
    ts.emplace_back([&]() {
      int64_t i;
      while ((i = next.fetch_add(1)) < n_idx) {
        if (ps_get_f32(h, idxs[i], dst + i * elems) != 0) err.store(1);
      }
    });
  }
  for (auto& t : ts) t.join();
  return err.load() ? -1 : 0;
}

void ps_close(void* h) {
  auto* s = static_cast<Store*>(h);
  if (s->base) munmap(const_cast<uint8_t*>(s->base), s->map_bytes);
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

// ---------- writer ----------

void* psw_create(const char* data_bin_path, uint32_t dtype, uint32_t ndim,
                 const uint64_t* dims) {
  if (dtype_size(dtype) == 0 || ndim == 0 || ndim > 8) return nullptr;
  FILE* f = std::fopen(data_bin_path, "wb");
  if (!f) return nullptr;
  auto* w = new Writer();
  w->f = f;
  w->path = data_bin_path;
  w->hdr.magic = kMagic;
  w->hdr.dtype = dtype;
  w->hdr.ndim = ndim;
  std::memcpy(w->hdr.dims, dims, sizeof(uint64_t) * ndim);
  w->hdr.count = 0;
  w->record_bytes = record_elems(w->hdr) * dtype_size(dtype);
  // reserve header space
  std::vector<uint8_t> zeros(kHeaderBytes, 0);
  std::fwrite(zeros.data(), 1, kHeaderBytes, f);
  return w;
}

int psw_append(void* h, const void* data) {
  auto* w = static_cast<Writer*>(h);
  if (std::fwrite(data, 1, w->record_bytes, w->f) != w->record_bytes) return -1;
  w->hdr.count += 1;
  return 0;
}

int psw_finish(void* h) {
  auto* w = static_cast<Writer*>(h);
  std::fflush(w->f);
  std::fseek(w->f, 0, SEEK_SET);
  std::fwrite(&w->hdr, 1, sizeof(Header), w->f);
  int rc = std::fclose(w->f);
  delete w;
  return rc == 0 ? 0 : -1;
}

}  // extern "C"
