// gaot_io: native sample-store runtime for gaot3d_tpu.
//
// Role: the host-side data loader / memory path. The reference's data loading
// leans on native third-party code (torch C++ serialization, PyG C++ collate);
// here the equivalent is first-party: a flat binary sample format (.gsb) that
// is mmap'd zero-copy, plus threaded padded-batch assembly straight into the
// destination buffers the device transfer reads from. With one host core per
// chip, cutting Python/zip overhead out of the 8-10M-node streaming path is
// what keeps the TPU fed.
//
// Format (.gsb), little-endian:
//   magic "GSB1" | u32 n_arrays
//   per array: u32 name_len | name bytes | u32 dtype | u32 ndim |
//              i64 dims[ndim] | i64 byte_offset (from file start)
//   payload: raw array bytes, 64-byte aligned.
// dtype codes: 0=f32 1=i32 2=u8 3=f64 4=i64 5=bool
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libgaot_io.so gaot_io.cpp -lpthread
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

struct ArrayInfo {
  std::string name;
  uint32_t dtype;
  uint32_t ndim;
  std::vector<int64_t> dims;
  int64_t offset;
};

struct GsbFile {
  int fd = -1;
  void* map = nullptr;
  size_t size = 0;
  std::vector<ArrayInfo> arrays;
};

bool read_header(GsbFile* f) {
  const char* p = static_cast<const char*>(f->map);
  const char* end = p + f->size;
  if (f->size < 8 || std::memcmp(p, "GSB1", 4) != 0) return false;
  uint32_t n;
  std::memcpy(&n, p + 4, 4);
  const char* cur = p + 8;
  for (uint32_t i = 0; i < n; ++i) {
    ArrayInfo info;
    uint32_t name_len;
    if (cur + 4 > end) return false;
    std::memcpy(&name_len, cur, 4);
    cur += 4;
    if (cur + name_len > end) return false;
    info.name.assign(cur, name_len);
    cur += name_len;
    if (cur + 8 > end) return false;
    std::memcpy(&info.dtype, cur, 4);
    std::memcpy(&info.ndim, cur + 4, 4);
    cur += 8;
    info.dims.resize(info.ndim);
    if (cur + 8 * info.ndim + 8 > end) return false;
    std::memcpy(info.dims.data(), cur, 8 * info.ndim);
    cur += 8 * info.ndim;
    std::memcpy(&info.offset, cur, 8);
    cur += 8;
    f->arrays.push_back(std::move(info));
  }
  return true;
}

}  // namespace

extern "C" {

void* gsb_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* f = new GsbFile();
  f->fd = fd;
  f->map = map;
  f->size = static_cast<size_t>(st.st_size);
  if (!read_header(f)) {
    munmap(map, f->size);
    ::close(fd);
    delete f;
    return nullptr;
  }
  return f;
}

int gsb_num_arrays(void* handle) {
  return static_cast<int>(static_cast<GsbFile*>(handle)->arrays.size());
}

const char* gsb_name(void* handle, int i) {
  return static_cast<GsbFile*>(handle)->arrays[i].name.c_str();
}

int gsb_dtype(void* handle, int i) {
  return static_cast<int>(static_cast<GsbFile*>(handle)->arrays[i].dtype);
}

int gsb_ndim(void* handle, int i) {
  return static_cast<int>(static_cast<GsbFile*>(handle)->arrays[i].ndim);
}

const int64_t* gsb_dims(void* handle, int i) {
  return static_cast<GsbFile*>(handle)->arrays[i].dims.data();
}

const void* gsb_data(void* handle, int i) {
  auto* f = static_cast<GsbFile*>(handle);
  return static_cast<const char*>(f->map) + f->arrays[i].offset;
}

void gsb_close(void* handle) {
  auto* f = static_cast<GsbFile*>(handle);
  if (f->map) munmap(f->map, f->size);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

// Assemble a padded batch: B variable-length row blocks [counts[b], C] f32
// copied into out [B, n_pad, C] (pre-zeroed by caller or zeroed here) and a
// bool node mask [B, n_pad]. Threaded over the batch.
void pad_batch_f32(const float** srcs, const int64_t* counts, int B,
                   int64_t n_pad, int64_t C, float* out, uint8_t* mask) {
  auto work = [&](int b) {
    int64_t n = counts[b] < n_pad ? counts[b] : n_pad;
    float* dst = out + b * n_pad * C;
    std::memcpy(dst, srcs[b], sizeof(float) * n * C);
    std::memset(dst + n * C, 0, sizeof(float) * (n_pad - n) * C);
    uint8_t* mb = mask + b * n_pad;
    std::memset(mb, 1, n);
    std::memset(mb + n, 0, n_pad - n);
  };
  unsigned hw = std::thread::hardware_concurrency();
  if (B <= 1 || hw <= 1) {
    for (int b = 0; b < B; ++b) work(b);
    return;
  }
  std::vector<std::thread> threads;
  int stride = static_cast<int>(hw) < B ? static_cast<int>(hw) : B;
  for (int t = 0; t < stride; ++t) {
    threads.emplace_back([&, t]() {
      for (int b = t; b < B; b += stride) work(b);
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
