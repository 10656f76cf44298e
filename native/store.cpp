// romhc_store — native array persistence for the experiment store.
//
// The framework checkpoints multi-hundred-MB snapshot matrices after every
// pipeline stage (reference behavior: joblib zlib pickles,
// /root/reference/src/experiments/HighContrast.py:93-96,150).  On the
// single-core hosts driving the TPU, Python-side compression dominates
// checkpoint latency; this library provides chunked zlib-compressed,
// crc32-checksummed array files with a C ABI consumed via ctypes.
//
// File format (little endian):
//   magic  u64  'R','H','C','S','T','O','R','1'
//   level  u32  zlib level used (0 = stored raw)
//   nbytes u64  uncompressed payload size
//   crc32  u32  of the uncompressed payload
//   nchunks u64
//   nchunks x { u64 compressed_size } followed by the compressed chunks
//
// Shape/dtype metadata stays in the Python-side JSON manifest — this layer
// moves bytes.

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint64_t kMagic = 0x314f54534348525fULL ^ 0x0;  // arbitrary tag
constexpr uint64_t kChunk = 8ull << 20;                   // 8 MiB chunks

struct Header {
  uint64_t magic;
  uint32_t level;
  uint64_t nbytes;
  uint32_t crc;
  uint64_t nchunks;
};

bool write_all(FILE* f, const void* p, size_t n) {
  return fwrite(p, 1, n, f) == n;
}

bool read_all(FILE* f, void* p, size_t n) {
  return fread(p, 1, n, f) == n;
}

int save_impl(const char* path, const uint8_t* data, uint64_t nbytes,
              int level);

// ------------------------- async writer queue ---------------------------- //
//
// Checkpoint compression runs on the single host core and previously
// blocked the device loop for seconds per dump.  rhc_save_async copies the
// payload and returns immediately; one background thread drains the queue,
// writing each file to "<path>.tmp" and renaming on success so a crash
// mid-write never leaves a plausible-but-corrupt file (the Python store's
// index.json is the commit point and is only written after rhc_flush).

struct Job {
  std::string path;
  std::vector<uint8_t> data;
  int level;
};

// Shared state of the writer queue.  INTENTIONALLY LEAKED (heap-allocated,
// never freed): the worker is a detached thread that blocks on the condition
// variable forever; destroying a pthread condvar/mutex with a waiter during
// static destruction is undefined behavior and was measured to hang the
// process at exit.  Leaking ~100 idle bytes lets _exit terminate the thread
// cleanly.
struct WriterState {
  std::mutex mu;
  std::condition_variable cv;
  std::deque<Job> queue;
  bool started = false;
  int inflight = 0;  // queued + currently writing
  int worst_rc = 0;  // first failure code since the last flush
};

WriterState& W() {
  static WriterState* s = new WriterState;
  return *s;
}

void worker_loop() {
  WriterState& w = W();
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lk(w.mu);
      w.cv.wait(lk, [&] { return !w.queue.empty(); });
      job = std::move(w.queue.front());
      w.queue.pop_front();
    }
    std::string tmp = job.path + ".tmp";
    int rc = save_impl(tmp.c_str(),
                       job.data.empty() ? nullptr : job.data.data(),
                       job.data.size(), job.level);
    if (rc == 0 && std::rename(tmp.c_str(), job.path.c_str()) != 0) rc = 6;
    {
      std::lock_guard<std::mutex> lk(w.mu);
      if (rc != 0 && w.worst_rc == 0) w.worst_rc = rc;
      --w.inflight;
    }
    w.cv.notify_all();
  }
}

}  // namespace

extern "C" {

// Enqueue an asynchronous save (payload copied); returns 0. Completion and
// errors are observed through rhc_flush.
int rhc_save_async(const char* path, const uint8_t* data, uint64_t nbytes,
                   int level) {
  WriterState& w = W();
  Job job;
  job.path = path;
  if (nbytes) job.data.assign(data, data + nbytes);
  job.level = level;
  {
    std::lock_guard<std::mutex> lk(w.mu);
    if (!w.started) {
      w.started = true;
      std::thread(worker_loop).detach();
    }
    w.queue.push_back(std::move(job));
    ++w.inflight;
  }
  w.cv.notify_all();
  return 0;
}

// Block until every queued write has completed; returns the first failure
// code since the previous flush (0 = all writes durable).
int rhc_flush() {
  WriterState& w = W();
  std::unique_lock<std::mutex> lk(w.mu);
  w.cv.wait(lk, [&] { return w.inflight == 0; });
  int rc = w.worst_rc;
  w.worst_rc = 0;
  return rc;
}

// Number of queued + in-flight asynchronous writes.
int rhc_pending() {
  WriterState& w = W();
  std::lock_guard<std::mutex> lk(w.mu);
  return w.inflight;
}

// Returns 0 on success.
int rhc_save(const char* path, const uint8_t* data, uint64_t nbytes,
             int level) {
  return save_impl(path, data, nbytes, level);
}

}  // extern "C"

namespace {
int save_impl(const char* path, const uint8_t* data, uint64_t nbytes,
              int level) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  Header h{kMagic, static_cast<uint32_t>(level), nbytes,
           static_cast<uint32_t>(crc32(0, data, nbytes)), 0};
  h.nchunks = (nbytes + kChunk - 1) / kChunk;
  if (nbytes == 0) h.nchunks = 0;
  if (!write_all(f, &h, sizeof h)) { fclose(f); return 2; }

  std::vector<uint8_t> buf;
  for (uint64_t c = 0; c < h.nchunks; ++c) {
    const uint8_t* src = data + c * kChunk;
    uint64_t len = (c + 1 == h.nchunks) ? nbytes - c * kChunk : kChunk;
    uint64_t out_len;
    if (level > 0) {
      uLongf bound = compressBound(len);
      buf.resize(bound);
      uLongf dst_len = bound;
      if (compress2(buf.data(), &dst_len, src, len, level) != Z_OK) {
        fclose(f);
        return 3;
      }
      out_len = dst_len;
    } else {
      out_len = len;
    }
    if (!write_all(f, &out_len, sizeof out_len)) { fclose(f); return 2; }
    if (!write_all(f, level > 0 ? buf.data() : src, out_len)) {
      fclose(f);
      return 2;
    }
  }
  int rc = fclose(f) == 0 ? 0 : 2;
  return rc;
}

}  // namespace

extern "C" {

// Reads header only; fills nbytes. Returns 0 on success.
int rhc_peek(const char* path, uint64_t* nbytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  Header h;
  if (!read_all(f, &h, sizeof h) || h.magic != kMagic) { fclose(f); return 4; }
  *nbytes = h.nbytes;
  fclose(f);
  return 0;
}

// Loads payload into caller-allocated buffer of size nbytes; verifies crc.
int rhc_load(const char* path, uint8_t* out, uint64_t nbytes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  Header h;
  if (!read_all(f, &h, sizeof h) || h.magic != kMagic ||
      h.nbytes != nbytes) {
    fclose(f);
    return 4;
  }
  std::vector<uint8_t> buf;
  const uint64_t max_clen = compressBound(kChunk) + 64;
  uint64_t off = 0;
  for (uint64_t c = 0; c < h.nchunks; ++c) {
    uint64_t clen;
    if (!read_all(f, &clen, sizeof clen)) { fclose(f); return 2; }
    // a corrupt/truncated chunk-length field must return an error code, not
    // throw bad_alloc across the C ABI (which would abort the process)
    if (clen > max_clen) { fclose(f); return 4; }
    uint64_t raw = (c + 1 == h.nchunks) ? nbytes - c * kChunk : kChunk;
    if (h.level > 0) {
      buf.resize(clen);
      if (!read_all(f, buf.data(), clen)) { fclose(f); return 2; }
      uLongf dst_len = raw;
      if (uncompress(out + off, &dst_len, buf.data(), clen) != Z_OK ||
          dst_len != raw) {
        fclose(f);
        return 3;
      }
    } else {
      if (clen != raw || !read_all(f, out + off, raw)) { fclose(f); return 2; }
    }
    off += raw;
  }
  fclose(f);
  if (crc32(0, out, nbytes) != h.crc) return 5;
  return 0;
}

}  // extern "C"
