// Native safetensors loader: mmap-backed zero-copy tensor access.
//
// The runtime IO layer of the engine (the reference relies on HF
// from_pretrained's native loaders; here checkpoint streaming is first-party).
// Parses the safetensors header (8-byte little-endian length + JSON), mmaps
// the file, and exposes per-tensor (dtype, shape, pointer) so Python can wrap
// the bytes as numpy arrays without copying.  Multi-gigabyte checkpoints load
// at page-cache speed and feed jax.device_put directly.
//
// C ABI (ctypes):
//   stl_open(path)            -> handle (0 on failure)
//   stl_tensor_count(h)       -> n
//   stl_tensor_name(h, i)     -> const char*
//   stl_tensor_info(h, name, dtype_out[16], ndim_out, shape_out[8],
//                   offset_out, nbytes_out) -> 0 ok / -1 missing
//   stl_data(h)               -> base pointer of the mmapped data section
//   stl_close(h)
//
// Build: g++ -O2 -shared -fPIC -o libstl.so safetensors_loader.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct TensorMeta {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0;
  uint64_t end = 0;
};

struct Handle {
  int fd = -1;
  uint8_t* map = nullptr;
  size_t map_size = 0;
  uint64_t data_offset = 0;
  std::vector<TensorMeta> tensors;
};

// Minimal JSON scanner for the safetensors header: a flat object of
// {"name": {"dtype": "...", "shape": [...], "data_offsets": [b, e]}, ...}.
// Tolerates "__metadata__" and arbitrary key order.
class HeaderParser {
 public:
  HeaderParser(const char* s, size_t n) : s_(s), n_(n) {}

  bool parse(std::vector<TensorMeta>& out) {
    skip_ws();
    if (!consume('{')) return false;
    while (true) {
      skip_ws();
      if (consume('}')) return true;
      std::string key;
      if (!parse_string(key)) return false;
      skip_ws();
      if (!consume(':')) return false;
      skip_ws();
      if (key == "__metadata__") {
        if (!skip_value()) return false;
      } else {
        TensorMeta t;
        t.name = key;
        if (!parse_tensor(t)) return false;
        out.push_back(std::move(t));
      }
      skip_ws();
      consume(',');
    }
  }

 private:
  const char* s_;
  size_t n_;
  size_t i_ = 0;

  void skip_ws() {
    while (i_ < n_ && (s_[i_] == ' ' || s_[i_] == '\t' || s_[i_] == '\n' || s_[i_] == '\r')) i_++;
  }
  bool consume(char c) {
    if (i_ < n_ && s_[i_] == c) { i_++; return true; }
    return false;
  }
  bool parse_string(std::string& out) {
    if (!consume('"')) return false;
    out.clear();
    while (i_ < n_ && s_[i_] != '"') {
      if (s_[i_] == '\\' && i_ + 1 < n_) i_++;
      out.push_back(s_[i_++]);
    }
    return consume('"');
  }
  bool parse_int(int64_t& out) {
    skip_ws();
    bool neg = consume('-');
    if (i_ >= n_ || s_[i_] < '0' || s_[i_] > '9') return false;
    out = 0;
    while (i_ < n_ && s_[i_] >= '0' && s_[i_] <= '9') out = out * 10 + (s_[i_++] - '0');
    if (neg) out = -out;
    return true;
  }
  bool parse_int_array(std::vector<int64_t>& out) {
    skip_ws();
    if (!consume('[')) return false;
    out.clear();
    skip_ws();
    if (consume(']')) return true;
    while (true) {
      int64_t v;
      if (!parse_int(v)) return false;
      out.push_back(v);
      skip_ws();
      if (consume(']')) return true;
      if (!consume(',')) return false;
    }
  }
  bool skip_value() {
    skip_ws();
    if (i_ >= n_) return false;
    char c = s_[i_];
    if (c == '"') { std::string tmp; return parse_string(tmp); }
    if (c == '{' || c == '[') {
      char open = c, close = (c == '{') ? '}' : ']';
      int depth = 0;
      bool in_str = false;
      for (; i_ < n_; i_++) {
        char ch = s_[i_];
        if (in_str) {
          if (ch == '\\') i_++;
          else if (ch == '"') in_str = false;
        } else if (ch == '"') in_str = true;
        else if (ch == open) depth++;
        else if (ch == close) { depth--; if (depth == 0) { i_++; return true; } }
      }
      return false;
    }
    // number / literal
    while (i_ < n_ && s_[i_] != ',' && s_[i_] != '}' && s_[i_] != ']') i_++;
    return true;
  }
  bool parse_tensor(TensorMeta& t) {
    skip_ws();
    if (!consume('{')) return false;
    while (true) {
      skip_ws();
      if (consume('}')) return true;
      std::string key;
      if (!parse_string(key)) return false;
      skip_ws();
      if (!consume(':')) return false;
      if (key == "dtype") {
        skip_ws();
        if (!parse_string(t.dtype)) return false;
      } else if (key == "shape") {
        if (!parse_int_array(t.shape)) return false;
      } else if (key == "data_offsets") {
        std::vector<int64_t> off;
        if (!parse_int_array(off) || off.size() != 2) return false;
        t.begin = static_cast<uint64_t>(off[0]);
        t.end = static_cast<uint64_t>(off[1]);
      } else {
        if (!skip_value()) return false;
      }
      skip_ws();
      consume(',');
    }
  }
};

}  // namespace

extern "C" {

void* stl_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) { ::close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) { ::close(fd); return nullptr; }
  madvise(map, st.st_size, MADV_SEQUENTIAL);

  auto* h = new Handle();
  h->fd = fd;
  h->map = static_cast<uint8_t*>(map);
  h->map_size = static_cast<size_t>(st.st_size);

  uint64_t header_len = 0;
  std::memcpy(&header_len, h->map, 8);  // little-endian hosts only
  // subtract, don't add: `8 + header_len` overflows for a corrupt length
  // near UINT64_MAX and would pass the check, sending the parser out of
  // bounds instead of failing with nullptr
  if (header_len > h->map_size - 8) {
    munmap(map, h->map_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  HeaderParser parser(reinterpret_cast<const char*>(h->map + 8), header_len);
  if (!parser.parse(h->tensors)) {
    munmap(map, h->map_size);
    ::close(fd);
    delete h;
    return nullptr;
  }
  h->data_offset = 8 + header_len;
  // validate every tensor's data range against the mapping so a corrupt
  // header can never hand out an out-of-bounds view
  const uint64_t data_bytes = h->map_size - h->data_offset;
  for (const auto& t : h->tensors) {
    if (t.begin > t.end || t.end > data_bytes) {
      munmap(map, h->map_size);
      ::close(fd);
      delete h;
      return nullptr;
    }
  }
  return h;
}

int64_t stl_tensor_count(void* handle) {
  return static_cast<Handle*>(handle)->tensors.size();
}

const char* stl_tensor_name(void* handle, int64_t i) {
  auto* h = static_cast<Handle*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(h->tensors.size())) return nullptr;
  return h->tensors[i].name.c_str();
}

int stl_tensor_info(void* handle, const char* name, char* dtype_out,
                    int64_t* ndim_out, int64_t* shape_out,
                    uint64_t* offset_out, uint64_t* nbytes_out) {
  auto* h = static_cast<Handle*>(handle);
  for (const auto& t : h->tensors) {
    if (t.name == name) {
      std::snprintf(dtype_out, 15, "%s", t.dtype.c_str());
      *ndim_out = static_cast<int64_t>(t.shape.size());
      for (size_t d = 0; d < t.shape.size() && d < 8; d++) shape_out[d] = t.shape[d];
      *offset_out = h->data_offset + t.begin;
      *nbytes_out = t.end - t.begin;
      return 0;
    }
  }
  return -1;
}

const uint8_t* stl_data(void* handle) {
  return static_cast<Handle*>(handle)->map;
}

void stl_close(void* handle) {
  auto* h = static_cast<Handle*>(handle);
  if (h->map) munmap(h->map, h->map_size);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
