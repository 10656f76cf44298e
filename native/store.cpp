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

#include <cstdint>
#include <cstdio>
#include <cstring>
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

}  // namespace

extern "C" {

// Returns 0 on success.
int rhc_save(const char* path, const uint8_t* data, uint64_t nbytes,
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
