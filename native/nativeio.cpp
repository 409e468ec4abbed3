// nativeio: native data-loading core for asy_vrnet_tpu.
//
// The reference delegates input loading to torch DataLoader worker processes
// (train.py:534-539); this framework's equivalent is a C++ thread pool that
// parses radar .npz archives (zip + .npy members, stored or deflate via
// zlib) straight into caller-provided contiguous batch buffers — no GIL, no
// per-file Python allocation, overlapping decompression with the device step.
//
// C ABI (ctypes-friendly):
//   nio_load_npz_f32   : single-file load into a float32 buffer
//   nio_pool_create/destroy
//   nio_pool_load_batch: parallel load of N files into one batch buffer
//
// Build: g++ -O3 -shared -fPIC -std=c++17 nativeio.cpp -o libnativeio.so -lz -lpthread
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
};

bool read_file(const char* path, Buffer* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->data.resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

struct ZipEntry {
  std::string name;
  uint16_t method = 0;
  uint64_t comp_size = 0;
  uint64_t uncomp_size = 0;
  uint64_t local_offset = 0;
};

// Parse the central directory (robust against data descriptors that make
// streaming local headers unreliable).
bool parse_zip(const Buffer& buf, std::vector<ZipEntry>* entries) {
  const uint8_t* d = buf.data.data();
  const size_t n = buf.data.size();
  if (n < 22) return false;
  // find EOCD signature 0x06054b50 scanning backwards (comment <= 64KB)
  size_t scan_start = n >= (1 << 16) + 22 ? n - ((1 << 16) + 22) : 0;
  size_t eocd = SIZE_MAX;
  for (size_t i = n - 22 + 1; i-- > scan_start;) {
    if (rd32(d + i) == 0x06054b50u) { eocd = i; break; }
  }
  if (eocd == SIZE_MAX) return false;
  uint16_t count = rd16(d + eocd + 10);
  uint32_t cd_off32 = rd32(d + eocd + 16);
  uint64_t cd_off = cd_off32;
  uint64_t total = count;
  if (cd_off32 == 0xFFFFFFFFu || count == 0xFFFF) {
    // zip64: locate the zip64 EOCD locator just before the EOCD
    if (eocd < 20) return false;
    size_t loc = eocd - 20;
    if (rd32(d + loc) != 0x07064b50u) return false;
    uint64_t z64_off;
    std::memcpy(&z64_off, d + loc + 8, 8);
    if (z64_off + 56 > n || rd32(d + z64_off) != 0x06064b50u) return false;
    std::memcpy(&total, d + z64_off + 32, 8);
    std::memcpy(&cd_off, d + z64_off + 48, 8);
  }
  uint64_t p = cd_off;
  for (uint64_t i = 0; i < total; ++i) {
    if (p + 46 > n || rd32(d + p) != 0x02014b50u) return false;
    ZipEntry e;
    e.method = rd16(d + p + 10);
    e.comp_size = rd32(d + p + 20);
    e.uncomp_size = rd32(d + p + 24);
    uint16_t name_len = rd16(d + p + 28);
    uint16_t extra_len = rd16(d + p + 30);
    uint16_t comment_len = rd16(d + p + 32);
    e.local_offset = rd32(d + p + 42);
    e.name.assign(reinterpret_cast<const char*>(d + p + 46), name_len);
    // zip64 extra fields for any saturated 32-bit values
    const uint8_t* ex = d + p + 46 + name_len;
    const uint8_t* ex_end = ex + extra_len;
    while (ex + 4 <= ex_end) {
      uint16_t tag = rd16(ex);
      uint16_t sz = rd16(ex + 2);
      if (tag == 0x0001) {
        const uint8_t* q = ex + 4;
        if (e.uncomp_size == 0xFFFFFFFFu) { std::memcpy(&e.uncomp_size, q, 8); q += 8; }
        if (e.comp_size == 0xFFFFFFFFu) { std::memcpy(&e.comp_size, q, 8); q += 8; }
        if (e.local_offset == 0xFFFFFFFFu) { std::memcpy(&e.local_offset, q, 8); q += 8; }
      }
      ex += 4 + sz;
    }
    entries->push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// Offset of an entry's payload, skipping its local header.
bool entry_data_offset(const Buffer& buf, const ZipEntry& e, uint64_t* off) {
  const uint8_t* d = buf.data.data();
  uint64_t p = e.local_offset;
  if (p + 30 > buf.data.size() || rd32(d + p) != 0x04034b50u) return false;
  uint16_t name_len = rd16(d + p + 26);
  uint16_t extra_len = rd16(d + p + 28);
  *off = p + 30 + name_len + extra_len;
  return true;
}

bool inflate_raw(const uint8_t* src, size_t src_n, uint8_t* dst, size_t dst_n) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(src_n);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dst_n);
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == dst_n;
}

// Minimal .npy parser: '<f4'/'<f8', C order. Writes float32.
bool parse_npy_f32(const uint8_t* d, size_t n, float* out, int64_t capacity,
                   int64_t* shape, int32_t* ndim, int32_t max_dims) {
  if (n < 10 || std::memcmp(d, "\x93NUMPY", 6) != 0) return false;
  uint8_t major = d[6];
  size_t hlen, hoff;
  if (major == 1) { hlen = rd16(d + 8); hoff = 10; }
  else { hlen = rd32(d + 8); hoff = 12; }
  if (hoff + hlen > n) return false;
  std::string header(reinterpret_cast<const char*>(d + hoff), hlen);

  auto find_val = [&](const char* key) -> std::string {
    size_t k = header.find(key);
    if (k == std::string::npos) return "";
    size_t c = header.find(':', k);
    size_t e = header.find(',', c);
    // shape tuples contain commas; handle separately below
    return header.substr(c + 1, e - c - 1);
  };

  bool f8 = header.find("'<f8'") != std::string::npos;
  bool f4 = header.find("'<f4'") != std::string::npos;
  if (!f4 && !f8) return false;
  if (header.find("'fortran_order': True") != std::string::npos) return false;

  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  size_t lp = header.find('(', sp);
  size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) return false;
  std::string shape_str = header.substr(lp + 1, rp - lp - 1);
  int32_t nd = 0;
  int64_t total = 1;
  size_t pos = 0;
  while (pos < shape_str.size() && nd < max_dims) {
    while (pos < shape_str.size() && !isdigit(shape_str[pos])) ++pos;
    if (pos >= shape_str.size()) break;
    int64_t v = 0;
    while (pos < shape_str.size() && isdigit(shape_str[pos])) {
      v = v * 10 + (shape_str[pos] - '0');
      ++pos;
    }
    shape[nd++] = v;
    total *= v;
  }
  *ndim = nd;
  if (total > capacity) return false;
  const uint8_t* payload = d + hoff + hlen;
  size_t need = static_cast<size_t>(total) * (f8 ? 8 : 4);
  if (hoff + hlen + need > n) return false;
  if (f4) {
    std::memcpy(out, payload, need);
  } else {
    const double* src = reinterpret_cast<const double*>(payload);
    for (int64_t i = 0; i < total; ++i) out[i] = static_cast<float>(src[i]);
  }
  (void)find_val;
  return true;
}

int load_npz_f32_impl(const char* path, const char* member, float* out,
                      int64_t capacity, int64_t* shape, int32_t* ndim,
                      int32_t max_dims) {
  Buffer buf;
  if (!read_file(path, &buf)) return -1;
  std::vector<ZipEntry> entries;
  if (!parse_zip(buf, &entries)) return -2;
  const ZipEntry* chosen = nullptr;
  std::string want = member && member[0] ? std::string(member) + ".npy" : "";
  for (const auto& e : entries) {
    if (want.empty() || e.name == want) { chosen = &e; break; }
  }
  if (!chosen) return -3;
  uint64_t off;
  if (!entry_data_offset(buf, *chosen, &off)) return -4;
  const uint8_t* payload = buf.data.data() + off;
  // Truncated/corrupt archives must fail, not over-read the file buffer.
  if (chosen->method == 0) {
    if (off + chosen->uncomp_size > buf.data.size()) return -4;
    if (!parse_npy_f32(payload, chosen->uncomp_size, out, capacity, shape,
                       ndim, max_dims))
      return -5;
  } else if (chosen->method == 8) {
    if (off + chosen->comp_size > buf.data.size()) return -4;
    std::vector<uint8_t> raw(chosen->uncomp_size);
    if (!inflate_raw(payload, chosen->comp_size, raw.data(), raw.size()))
      return -6;
    if (!parse_npy_f32(raw.data(), raw.size(), out, capacity, shape, ndim,
                       max_dims))
      return -5;
  } else {
    return -7;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------
class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { this->run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_;
};

}  // namespace

extern "C" {

int nio_load_npz_f32(const char* path, const char* member, float* out,
                     int64_t capacity, int64_t* shape, int32_t* ndim,
                     int32_t max_dims) {
  return load_npz_f32_impl(path, member, out, capacity, shape, ndim, max_dims);
}

void* nio_pool_create(int threads) { return new Pool(threads); }
void nio_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Load `count` npz files in parallel into out[i * stride .. ]; returns the
// number of failures (0 == success); per-file status in status[count].
// `expected` > 0 requires each parsed array to have exactly that many
// elements (the batch stride) — a smaller array would otherwise leave
// uninitialised tail garbage in the batch buffer while reporting success.
int nio_pool_load_batch(void* pool, const char** paths, const char* member,
                        int count, float* out, int64_t stride,
                        int64_t expected, int32_t* status) {
  Pool* p = static_cast<Pool*>(pool);
  std::atomic<int> remaining(count), failures(0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < count; ++i) {
    p->submit([&, i] {
      int64_t shape[8];
      int32_t nd = 0;
      int rc = load_npz_f32_impl(paths[i], member, out + i * stride, stride,
                                 shape, &nd, 8);
      if (rc == 0 && expected > 0) {
        int64_t total = 1;
        for (int32_t k = 0; k < nd; ++k) total *= shape[k];
        if (total != expected) rc = -8;
      }
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

}  // extern "C"
