// Native host data-plane for the input pipeline.
//
// The hybrid (images-on-disk) read path spends its host time in per-sample
// Python orchestration around JPEG decode + resize. This translation unit
// packages that per-batch work — file read, libjpeg(-turbo) decode with
// DCT-domain prescaling, area resize, batch-buffer assembly — behind a C ABI
// consumed via ctypes (linnaeus_tpu/native/__init__.py), with an internal
// pthread pool so a whole batch is one Python call and the workers never
// touch the GIL. Reference behavior being accelerated:
// prefetching_hybrid_dataset.py:16-598 (per-sample cv2.imread + resize) —
// re-designed batch-at-a-time rather than translated.
//
// Also exports a threaded row-gather used to unsort bulk HDF5 reads on
// multi-core hosts (neutral on one core; numpy fancy-indexing is the
// fallback).
//
// Build: g++ -O3 -shared -fPIC -pthread dataplane.cpp -ljpeg
// (libjpeg62-turbo provides the classic API with SIMD decode; DCT scaling
// via scale_num/scale_denom gives near-free 1/2, 1/4, 1/8 decodes when the
// stored resolution exceeds the training size — the same trick NVIDIA DALI
// and tf.image's fast paths use.)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <cerrno>
#include <condition_variable>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>
#include <atomic>
#include <algorithm>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit_longjmp(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void output_message_quiet(j_common_ptr) {
  // corrupt files surface as LN_DECODE_ERR statuses; keep stderr clean
}

// Area (box-integration) resize, fractional edge weights — matches
// cv2.INTER_AREA's downscale semantics. Falls back to bilinear when
// upscaling (src < dst), which only happens for stored images smaller than
// the training resolution.
void resize_area_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int th,
                    int tw, int channels) {
  if (sh == th && sw == tw) {
    std::memcpy(dst, src, (size_t)sh * sw * channels);
    return;
  }
  const double sy = (double)sh / th;
  const double sx = (double)sw / tw;
  if (sh >= th && sw >= tw) {
    std::vector<float> row_acc((size_t)tw * channels);
    for (int oy = 0; oy < th; ++oy) {
      const double y0 = oy * sy, y1 = (oy + 1) * sy;
      const int iy0 = (int)y0, iy1 = std::min((int)std::ceil(y1), sh);
      std::fill(row_acc.begin(), row_acc.end(), 0.f);
      double wsum_y = 0.0;
      for (int iy = iy0; iy < iy1; ++iy) {
        const double wy = std::min<double>(y1, iy + 1) - std::max<double>(y0, iy);
        wsum_y += wy;
        const uint8_t* srow = src + (size_t)iy * sw * channels;
        for (int ox = 0; ox < tw; ++ox) {
          const double x0 = ox * sx, x1 = (ox + 1) * sx;
          const int ix0 = (int)x0, ix1 = std::min((int)std::ceil(x1), sw);
          for (int c = 0; c < channels; ++c) {
            double acc = 0.0, wsum_x = 0.0;
            for (int ix = ix0; ix < ix1; ++ix) {
              const double wx =
                  std::min<double>(x1, ix + 1) - std::max<double>(x0, ix);
              acc += wx * srow[(size_t)ix * channels + c];
              wsum_x += wx;
            }
            row_acc[(size_t)ox * channels + c] +=
                (float)(wy * acc / std::max(wsum_x, 1e-9));
          }
        }
      }
      uint8_t* drow = dst + (size_t)oy * tw * channels;
      const float inv = (float)(1.0 / std::max(wsum_y, 1e-9));
      for (int i = 0; i < tw * channels; ++i) {
        const float v = row_acc[i] * inv;
        drow[i] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
      }
    }
    return;
  }
  // bilinear upscale (align cv2.INTER_LINEAR's half-pixel convention)
  for (int oy = 0; oy < th; ++oy) {
    const double fy = std::max(0.0, (oy + 0.5) * sy - 0.5);
    const int y0 = std::min((int)fy, sh - 1), y1 = std::min(y0 + 1, sh - 1);
    const double wy = fy - y0;
    for (int ox = 0; ox < tw; ++ox) {
      const double fx = std::max(0.0, (ox + 0.5) * sx - 0.5);
      const int x0 = std::min((int)fx, sw - 1), x1 = std::min(x0 + 1, sw - 1);
      const double wx = fx - x0;
      for (int c = 0; c < channels; ++c) {
        const double v00 = src[((size_t)y0 * sw + x0) * channels + c];
        const double v01 = src[((size_t)y0 * sw + x1) * channels + c];
        const double v10 = src[((size_t)y1 * sw + x0) * channels + c];
        const double v11 = src[((size_t)y1 * sw + x1) * channels + c];
        const double v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                         v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)oy * tw + ox) * channels + c] =
            (uint8_t)std::min(255.0, std::max(0.0, v + 0.5));
      }
    }
  }
}

// status codes per sample. LN_MISSING is strictly file-does-not-exist
// (ENOENT/ENOTDIR); any other open failure (EACCES, EMFILE, EIO, ...) is
// LN_OPEN_ERR so ALLOW_MISSING_IMAGES never zero-fills over a transient
// fd-exhaustion or permission problem — those must surface loudly (and are
// retryable OSErrors on the Python side).
enum : int32_t { LN_OK = 0, LN_MISSING = 1, LN_DECODE_ERR = 2, LN_OPEN_ERR = 3 };

// Decode one in-memory JPEG to RGB uint8 at target x target. Picks the
// largest DCT scale denominator in {8,4,2,1} whose output still covers the
// target, so an e.g. 1024px photo decodes 1/4-size for a 224px training
// resolution (~6x less IDCT + colorspace work).
int32_t decode_mem(const uint8_t* data, size_t len, int target, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_longjmp;
  jerr.pub.output_message = output_message_quiet;
  std::vector<uint8_t> decoded;  // declared before setjmp target use
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return LN_DECODE_ERR;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int d : {8, 4, 2}) {
    if ((int)cinfo.image_width / d >= target &&
        (int)cinfo.image_height / d >= target) {
      cinfo.scale_denom = d;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int sw = (int)cinfo.output_width;
  const int sh = (int)cinfo.output_height;
  const int ch = (int)cinfo.output_components;  // 3 after JCS_RGB
  decoded.resize((size_t)sh * sw * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = decoded.data() + (size_t)cinfo.output_scanline * sw * ch;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (ch != 3) {
    // grayscale JPEG: replicate to 3 channels before resize
    std::vector<uint8_t> rgb((size_t)sh * sw * 3);
    for (size_t i = 0; i < (size_t)sh * sw; ++i)
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = decoded[i * ch];
    resize_area_u8(rgb.data(), sh, sw, out, target, target, 3);
  } else {
    resize_area_u8(decoded.data(), sh, sw, out, target, target, 3);
  }
  return LN_OK;
}

// File wrapper: read bytes, then decode_mem.
int32_t decode_one(const char* path, int target, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    return (errno == ENOENT || errno == ENOTDIR) ? LN_MISSING : LN_OPEN_ERR;
  }
  std::fseek(f, 0, SEEK_END);
  const long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return LN_DECODE_ERR;
  }
  std::vector<uint8_t> buf((size_t)len);
  const size_t got = std::fread(buf.data(), 1, (size_t)len, f);
  std::fclose(f);
  if (got != (size_t)len) return LN_DECODE_ERR;
  return decode_mem(buf.data(), (size_t)len, target, out);
}

// Persistent shared worker pool. One fixed set of hardware_concurrency
// threads serves ALL parallel_for calls process-wide: repeated batch calls
// stop paying thread create/join, and concurrent callers (e.g. several
// loader batch workers with DATA.PREFETCH.BATCH_CONCURRENCY > 1) interleave
// their work items on the same fixed set of threads instead of
// oversubscribing the host with callers x cpu_count spawned threads.
struct Job {
  std::atomic<int> next{0};
  std::atomic<int> done{0};
  std::atomic<int> claimants{0};  // workers (incl. the caller) draining this job
  int n = 0;
  int cap = 1;  // max concurrent claimants — honors the caller's n_threads
  const std::function<void(int)>* fn = nullptr;
};

class Pool {
 public:
  static Pool& instance() {
    // never destroyed: workers park on the cv at process exit
    static Pool* p = new Pool();
    return *p;
  }

  void parallel_for(int n, int cap, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    if (n == 1 || cap <= 1 || workers_.empty()) {
      for (int i = 0; i < n; ++i) fn(i);
      return;
    }
    auto job = std::make_shared<Job>();
    job->n = n;
    job->cap = cap;
    job->claimants.store(1);  // the caller takes one slot
    job->fn = &fn;
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push_back(job);
    }
    cv_.notify_all();
    drain(*job);  // the caller works too
    // stragglers: each claimed index is in flight on some worker; items are
    // milliseconds (a JPEG decode), so a yield-spin stays short
    while (job->done.load(std::memory_order_acquire) < n)
      std::this_thread::yield();
    std::lock_guard<std::mutex> lk(mu_);
    for (auto it = jobs_.begin(); it != jobs_.end(); ++it) {
      if (it->get() == job.get()) {
        jobs_.erase(it);
        break;
      }
    }
  }

 private:
  Pool() {
    const unsigned hw = std::thread::hardware_concurrency();
    const int nt = std::max(1, (int)(hw ? hw : 1) - 1);  // caller participates
    workers_.reserve(nt);
    for (int t = 0; t < nt; ++t) {
      workers_.emplace_back([this] { worker_loop(); });
    }
    for (auto& w : workers_) w.detach();
  }

  static void drain(Job& j) {
    for (int i = j.next.fetch_add(1); i < j.n; i = j.next.fetch_add(1)) {
      (*j.fn)(i);
      j.done.fetch_add(1, std::memory_order_release);
    }
  }

  void worker_loop() {
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      // job with unclaimed work closest to the front, if any
      std::shared_ptr<Job> job;
      for (auto& j : jobs_) {
        if (j->next.load(std::memory_order_relaxed) < j->n &&
            j->claimants.load(std::memory_order_relaxed) < j->cap) {
          // claim a concurrency slot; back off if we raced past the cap
          if (j->claimants.fetch_add(1) >= j->cap) {
            j->claimants.fetch_sub(1);
            continue;
          }
          job = j;  // shared_ptr copy keeps it alive past caller removal
          break;
        }
      }
      if (!job) {
        cv_.wait(lk);  // woken by the next parallel_for push
        continue;
      }
      lk.unlock();
      drain(*job);
      job->claimants.fetch_sub(1);
      job.reset();
      lk.lock();
    }
  }

  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<std::shared_ptr<Job>> jobs_;
};

void run_parallel(int n, int n_threads, const std::function<void(int)>& fn) {
  const int cap = std::max(1, std::min(n_threads, n));
  if (cap == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  Pool::instance().parallel_for(n, cap, fn);
}

}  // namespace

extern "C" {

int32_t ln_version() { return 3; }

// Decode+resize a batch of JPEG files into a contiguous uint8
// [n, target, target, 3] buffer. status_out[i] in {0 ok, 1 missing,
// 2 decode error, 3 open error (exists but unreadable: EACCES/EMFILE/...)};
// missing files are zero-filled when allow_missing. Returns the number of
// hard failures (missing when !allow_missing, decode errors, and open
// errors — the latter ALWAYS count, allow_missing or not).
int32_t ln_decode_jpeg_batch(const char* const* paths, int32_t n,
                             int32_t target, uint8_t* out, int32_t n_threads,
                             int32_t allow_missing, int32_t* status_out) {
  const size_t row = (size_t)target * target * 3;
  std::atomic<int32_t> failures{0};
  run_parallel((int)n, (int)n_threads, [&](int i) {
    const int32_t st = decode_one(paths[i], (int)target, out + (size_t)i * row);
    status_out[i] = st;
    if (st != LN_OK) {
      // zero-fill EVERY failed row (not just missing): a caller that
      // ignores a non-OK status must read an obvious placeholder, never
      // uninitialized heap memory (ln_decode_jpeg_mem_batch already does)
      std::memset(out + (size_t)i * row, 0, row);
      if (st != LN_MISSING || !allow_missing) failures.fetch_add(1);
    }
  });
  return failures.load();
}

// Decode+resize a batch of in-memory JPEG buffers (serving path: request
// bytes) into a contiguous uint8 [n, target, target, 3] buffer. Returns the
// number of undecodable buffers (status 2 entries are zero-filled).
int32_t ln_decode_jpeg_mem_batch(const uint8_t* const* bufs,
                                 const int64_t* lens, int32_t n,
                                 int32_t target, uint8_t* out,
                                 int32_t n_threads, int32_t* status_out) {
  const size_t row = (size_t)target * target * 3;
  std::atomic<int32_t> failures{0};
  run_parallel((int)n, (int)n_threads, [&](int i) {
    const int32_t st =
        decode_mem(bufs[i], (size_t)lens[i], (int)target, out + (size_t)i * row);
    status_out[i] = st;
    if (st != LN_OK) {
      std::memset(out + (size_t)i * row, 0, row);
      failures.fetch_add(1);
    }
  });
  return failures.load();
}

}  // extern "C"
