// Native asynchronous artifact writer: .npy arrays and grayscale PNGs.
//
// The experiment runners emit ~20 array/image artifacts per run plus
// periodic reconstruction snapshots (reference behavior:
// block_6_admm_loop_ver2.py:269-281, block_7_main_ver3.py:110-325). The
// matplotlib path dominates wall clock (minutes of figure rendering vs
// seconds of solve); this writer encodes raw grayscale PNGs (zlib) and npy
// files on a background thread so the solve loop never blocks on IO.
//
// C API (ctypes-friendly):
//   aw_init(n_threads)                      start the worker pool (idempotent)
//   aw_submit_npy(path, data, shape, ndim)  async float32 .npy write
//   aw_submit_png_gray(path, img, h, w, vmin, vmax)  async 8-bit gray PNG
//   aw_flush()                              block until the queue drains
// All submit calls copy their buffers; callers may free immediately.

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Pool {
  std::deque<std::function<void()>> q;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable cv_done;
  std::vector<std::thread> workers;
  int active = 0;
  bool stop = false;

  void run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !q.empty(); });
        if (stop && q.empty()) return;
        job = std::move(q.front());
        q.pop_front();
        ++active;
      }
      job();
      {
        std::lock_guard<std::mutex> lk(mu);
        --active;
        if (q.empty() && active == 0) cv_done.notify_all();
      }
    }
  }

  void start(int n) {
    std::lock_guard<std::mutex> lk(mu);
    while ((int)workers.size() < n) {
      workers.emplace_back([this] { run(); });
      // Detached: the pool lives for the process; callers synchronize via
      // aw_flush(), and detaching avoids std::terminate at static
      // destruction of joinable threads.
      workers.back().detach();
    }
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu);
      q.push_back(std::move(job));
    }
    cv.notify_one();
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return q.empty() && active == 0; });
  }
};

Pool& pool() {
  // Intentionally leaked: a static Pool's destructor would tear down the
  // mutex/condvar while detached workers still wait on them, hanging
  // process exit. The threads die with the process.
  static Pool* p = new Pool();
  return *p;
}

void write_file(const std::string& path, const std::vector<uint8_t>& bytes) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return;
  std::fwrite(bytes.data(), 1, bytes.size(), f);
  std::fclose(f);
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xff);
  v.push_back((x >> 16) & 0xff);
  v.push_back((x >> 8) & 0xff);
  v.push_back(x & 0xff);
}

void png_chunk(std::vector<uint8_t>& out, const char type[4],
               const std::vector<uint8_t>& payload) {
  put_be32(out, (uint32_t)payload.size());
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  out.insert(out.end(), payload.begin(), payload.end());
  uint32_t crc = crc32(0, out.data() + start, (uInt)(out.size() - start));
  put_be32(out, crc);
}

std::vector<uint8_t> encode_png_gray(const uint8_t* img, int h, int w) {
  std::vector<uint8_t> out = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::vector<uint8_t> ihdr;
  put_be32(ihdr, (uint32_t)w);
  put_be32(ihdr, (uint32_t)h);
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(0);   // color type: grayscale
  ihdr.push_back(0);   // compression
  ihdr.push_back(0);   // filter
  ihdr.push_back(0);   // interlace
  png_chunk(out, "IHDR", ihdr);

  // Raw scanlines, filter byte 0 per row.
  std::vector<uint8_t> raw((size_t)h * (w + 1));
  for (int r = 0; r < h; ++r) {
    raw[(size_t)r * (w + 1)] = 0;
    std::memcpy(&raw[(size_t)r * (w + 1) + 1], img + (size_t)r * w, w);
  }
  uLongf bound = compressBound((uLong)raw.size());
  std::vector<uint8_t> comp(bound);
  compress2(comp.data(), &bound, raw.data(), (uLong)raw.size(), 6);
  comp.resize(bound);
  png_chunk(out, "IDAT", comp);
  png_chunk(out, "IEND", {});
  return out;
}

std::vector<uint8_t> encode_npy_f32(const float* data, const long* shape,
                                    int ndim) {
  std::string hdr = "{'descr': '<f4', 'fortran_order': False, 'shape': (";
  size_t count = 1;
  for (int i = 0; i < ndim; ++i) {
    char buf[32];
    std::snprintf(buf, sizeof buf, "%ld", shape[i]);
    hdr += buf;
    if (ndim == 1 || i + 1 < ndim) hdr += ",";
    if (i + 1 < ndim) hdr += " ";
    count *= (size_t)shape[i];
  }
  hdr += "), }";
  size_t total = 10 + hdr.size() + 1;  // magic+ver+len + header + '\n'
  size_t pad = (64 - (total % 64)) % 64;
  hdr.append(pad, ' ');
  hdr += '\n';

  std::vector<uint8_t> out;
  const char magic[] = "\x93NUMPY";
  out.insert(out.end(), magic, magic + 6);
  out.push_back(1);
  out.push_back(0);
  out.push_back((uint8_t)(hdr.size() & 0xff));
  out.push_back((uint8_t)(hdr.size() >> 8));
  out.insert(out.end(), hdr.begin(), hdr.end());
  const uint8_t* p = (const uint8_t*)data;
  out.insert(out.end(), p, p + count * 4);
  return out;
}

}  // namespace

extern "C" {

int aw_init(int n_threads) {
  pool().start(n_threads > 0 ? n_threads : 1);
  return 0;
}

int aw_submit_npy(const char* path, const float* data, const long* shape,
                  int ndim) {
  if (ndim < 1 || ndim > 8) return 1;
  std::string p(path);
  std::vector<long> shp(shape, shape + ndim);
  size_t count = 1;
  for (int i = 0; i < ndim; ++i) count *= (size_t)shp[i];
  std::vector<float> copy(data, data + count);
  pool().submit([p, copy = std::move(copy), shp = std::move(shp), ndim] {
    write_file(p, encode_npy_f32(copy.data(), shp.data(), ndim));
  });
  return 0;
}

int aw_submit_png_gray(const char* path, const float* img, int h, int w,
                       float vmin, float vmax) {
  if (h <= 0 || w <= 0) return 1;
  std::string p(path);
  std::vector<uint8_t> u8((size_t)h * w);
  float scale = (vmax > vmin) ? 255.0f / (vmax - vmin) : 0.0f;
  for (size_t i = 0; i < u8.size(); ++i) {
    float v = (img[i] - vmin) * scale;
    u8[i] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
  }
  pool().submit([p, u8 = std::move(u8), h, w] {
    write_file(p, encode_png_gray(u8.data(), h, w));
  });
  return 0;
}

int aw_flush() {
  pool().flush();
  return 0;
}

}  // extern "C"
