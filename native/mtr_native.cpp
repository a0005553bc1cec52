// mtr_native — native host runtime for mt_renderer_tpu.
//
// The reference implementation is 100% native (Rust); this library keeps
// the host-side hot paths native in the new framework:
//
//   * MT Framework's CRC32 variant (NUL-terminated, inverted-state;
//     behavior of /root/reference/src/util/crc.rs:36-50),
//   * zlib inflate/deflate with a std::thread pool — the counterpart of
//     the reference's rayon par_iter archive compression
//     (rarchive.rs:228-238),
//   * BC1 block decode (byte-exact vs render/bcn.py, which follows the
//     Khronos/D3D11 functional spec).
//
// Plain C ABI, consumed from Python via ctypes (no pybind11 in the
// image). Build: native/build.sh -> mt_renderer_tpu/_mtr_native.so
//
// All functions return 0 on success, negative on error.

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

// ---------------------------------------------------------------- crc32

static uint32_t crc_table[256];
static std::atomic<bool> crc_init{false};

static void init_crc_table() {
  // standard reflected CRC-32 (poly 0xEDB88320) table
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init.store(true, std::memory_order_release);
}

// MT variant: the raw shift-register state starts at ``init`` (default
// 0xFFFFFFFF) with NO final inversion, and processing stops at the first
// NUL byte. Callers mask with 0x7fffffff for DTI hashes.
extern "C" uint32_t mtr_crc32(const uint8_t* data, size_t len, uint32_t init) {
  if (!crc_init.load(std::memory_order_acquire)) init_crc_table();
  uint32_t c = init;
  for (size_t i = 0; i < len; i++) {
    if (data[i] == 0) break;
    c = crc_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  }
  return c;
}

// ------------------------------------------------------------- zlib pool

struct Job {
  const uint8_t* src;
  size_t src_len;
  uint8_t* dst;
  size_t dst_cap;
  size_t out_len;  // written back
  int rc;
};

template <typename F>
static void run_pool(std::vector<Job>& jobs, int nthreads, F&& work) {
  if (nthreads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    nthreads = hc ? static_cast<int>(hc) : 1;
  }
  std::atomic<size_t> next{0};
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= jobs.size()) break;
      work(jobs[i]);
    }
  };
  if (nthreads == 1 || jobs.size() <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  int n = nthreads < static_cast<int>(jobs.size())
              ? nthreads
              : static_cast<int>(jobs.size());
  threads.reserve(n);
  for (int i = 0; i < n; i++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

static void inflate_one(Job& j) {
  uLongf out = j.dst_cap;
  int rc = uncompress(j.dst, &out, j.src, j.src_len);
  j.out_len = out;
  j.rc = (rc == Z_OK) ? 0 : -1;
}

static void deflate_one_l(Job& j, int level) {
  uLongf out = j.dst_cap;
  int rc = compress2(j.dst, &out, j.src, j.src_len, level);
  j.out_len = out;
  j.rc = (rc == Z_OK) ? 0 : -1;
}

// Batch inflate: srcs[i] (src_lens[i] bytes) -> dsts[i] (dst_caps[i]
// capacity); out_lens[i] receives the decompressed size.
extern "C" int mtr_inflate_many(int n, const uint8_t** srcs, const size_t* src_lens,
                     uint8_t** dsts, const size_t* dst_caps,
                     size_t* out_lens, int nthreads) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; i++)
    jobs[i] = Job{srcs[i], src_lens[i], dsts[i], dst_caps[i], 0, 0};
  run_pool(jobs, nthreads, inflate_one);
  int rc = 0;
  for (int i = 0; i < n; i++) {
    out_lens[i] = jobs[i].out_len;
    if (jobs[i].rc != 0) rc = -1;
  }
  return rc;
}

// Batch deflate (zlib format, like the reference's flate2 ZlibEncoder).
extern "C" int mtr_deflate_many(int n, const uint8_t** srcs, const size_t* src_lens,
                     uint8_t** dsts, const size_t* dst_caps,
                     size_t* out_lens, int level, int nthreads) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; i++)
    jobs[i] = Job{srcs[i], src_lens[i], dsts[i], dst_caps[i], 0, 0};
  run_pool(jobs, nthreads,
           [level](Job& j) { deflate_one_l(j, level); });
  int rc = 0;
  for (int i = 0; i < n; i++) {
    out_lens[i] = jobs[i].out_len;
    if (jobs[i].rc != 0) rc = -1;
  }
  return rc;
}

extern "C" size_t mtr_compress_bound(size_t n) { return compressBound(n); }

// ---------------------------------------------------------------- BC1

// Decode BC1 blocks into (height, width, 4) RGBA8 (row-major). Matches
// render/bcn.py decode_bc1_numpy byte-for-byte.
extern "C" int mtr_decode_bc1(const uint8_t* blocks, int width, int height,
                   uint8_t* out) {
  const int bw = (width + 3) / 4, bh = (height + 3) / 4;
  for (int by = 0; by < bh; by++) {
    for (int bx = 0; bx < bw; bx++) {
      const uint8_t* blk = blocks + (by * bw + bx) * 8;
      uint32_t c0 = blk[0] | (blk[1] << 8);
      uint32_t c1 = blk[2] | (blk[3] << 8);
      uint32_t bits = blk[4] | (blk[5] << 8) | (blk[6] << 16) |
                      (static_cast<uint32_t>(blk[7]) << 24);

      auto expand = [](uint32_t c, uint32_t* r, uint32_t* g, uint32_t* b) {
        uint32_t r5 = (c >> 11) & 0x1F, g6 = (c >> 5) & 0x3F, b5 = c & 0x1F;
        *r = (r5 << 3) | (r5 >> 2);
        *g = (g6 << 2) | (g6 >> 4);
        *b = (b5 << 3) | (b5 >> 2);
      };
      uint32_t r0, g0, b0, r1, g1, b1;
      expand(c0, &r0, &g0, &b0);
      expand(c1, &r1, &g1, &b1);

      uint8_t pal[4][4];
      auto set = [&pal](int i, uint32_t r, uint32_t g, uint32_t b,
                        uint32_t a) {
        pal[i][0] = static_cast<uint8_t>(r);
        pal[i][1] = static_cast<uint8_t>(g);
        pal[i][2] = static_cast<uint8_t>(b);
        pal[i][3] = static_cast<uint8_t>(a);
      };
      set(0, r0, g0, b0, 255);
      set(1, r1, g1, b1, 255);
      if (c0 > c1) {
        set(2, (2 * r0 + r1 + 1) / 3, (2 * g0 + g1 + 1) / 3,
            (2 * b0 + b1 + 1) / 3, 255);
        set(3, (r0 + 2 * r1 + 1) / 3, (g0 + 2 * g1 + 1) / 3,
            (b0 + 2 * b1 + 1) / 3, 255);
      } else {
        set(2, (r0 + r1) / 2, (g0 + g1) / 2, (b0 + b1) / 2, 255);
        set(3, 0, 0, 0, 0);
      }

      for (int t = 0; t < 16; t++) {
        int px = bx * 4 + (t % 4), py = by * 4 + (t / 4);
        if (px >= width || py >= height) continue;
        const uint8_t* c = pal[(bits >> (2 * t)) & 0x3];
        std::memcpy(out + (py * width + px) * 4, c, 4);
      }
    }
  }
  return 0;
}
