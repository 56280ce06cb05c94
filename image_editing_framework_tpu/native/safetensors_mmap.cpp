// Zero-copy safetensors reader.
//
// The reference loads weights through diffusers/safetensors (Python/Rust,
// p2p/edit_real.py:71-98). This native runtime component mmaps checkpoint
// files so multi-GB SD weights reach jax.device_put without intermediate
// heap copies: the Python wrapper (native/__init__.py) parses the JSON
// header and builds numpy views directly onto the mapped region.
//
// C API:
//   sts_open(path, &handle)       -> 0 on success
//   sts_header(handle, &ptr,&len) -> pointer to the raw JSON header bytes
//   sts_data(handle, &ptr,&len)   -> pointer to the tensor-data region
//   sts_close(handle)
//
// Build: make -C image_editing_framework_tpu/native

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapping {
  void* base = nullptr;
  size_t size = 0;
  const char* header = nullptr;
  uint64_t header_len = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
};

}  // namespace

extern "C" {

int sts_open(const char* path, void** out_handle) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    return -2;
  }
  void* base = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                      MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping holds its own reference
  if (base == MAP_FAILED) return -3;
  // Sequential read-ahead: weight loading walks the file front to back.
  ::madvise(base, static_cast<size_t>(st.st_size), MADV_SEQUENTIAL);

  uint64_t header_len = 0;
  std::memcpy(&header_len, base, sizeof(header_len));  // little-endian u64
  if (8 + header_len > static_cast<uint64_t>(st.st_size)) {
    ::munmap(base, static_cast<size_t>(st.st_size));
    return -4;
  }
  auto* m = new Mapping();
  m->base = base;
  m->size = static_cast<size_t>(st.st_size);
  m->header = static_cast<const char*>(base) + 8;
  m->header_len = header_len;
  m->data = reinterpret_cast<const uint8_t*>(m->header) + header_len;
  m->data_len = m->size - 8 - static_cast<size_t>(header_len);
  *out_handle = m;
  return 0;
}

int sts_header(void* handle, const char** ptr, uint64_t* len) {
  auto* m = static_cast<Mapping*>(handle);
  if (!m) return -1;
  *ptr = m->header;
  *len = m->header_len;
  return 0;
}

int sts_data(void* handle, const uint8_t** ptr, uint64_t* len) {
  auto* m = static_cast<Mapping*>(handle);
  if (!m) return -1;
  *ptr = m->data;
  *len = m->data_len;
  return 0;
}

int sts_close(void* handle) {
  auto* m = static_cast<Mapping*>(handle);
  if (!m) return -1;
  ::munmap(m->base, m->size);
  delete m;
  return 0;
}

}  // extern "C"
