// Native PNG decoder for the dataset image-ingest hot loop.
//
// The reference decodes 56,000 per-row PNGs serially through PIL at dataset
// build time (utils/data_loaders.py:337-367 — its #1 hot loop).  CPython
// threads cannot parallelize PIL there (it holds the GIL through most of the
// decode), but ctypes releases the GIL for the duration of a C call — so this
// decoder gives Python thread pools true multicore scaling while keeping the
// post-decode resize in PIL for bit-identical outputs.
//
// Uses libpng's simplified API: palette expansion and 16->8 bit conversion
// are handled by the library; images with an alpha channel return an error
// so the Python wrapper can fall back to PIL (alpha layouts must match PIL's
// numpy view exactly, and the robot data has none).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread native/fast_png.cpp
//        -lpng -o native/libfastpng.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <png.h>
#include <system_error>
#include <thread>
#include <vector>

namespace {

// IHDR bit depth straight from the file header (byte 24 after the 8-byte
// signature + IHDR chunk header); -1 when unreadable / not a PNG.  The
// simplified libpng API hides bit depth, but sub-8-bit grayscale must be
// deferred to PIL (PIL yields bool/low-depth arrays where libpng would
// expand to uint8 0/255 — different dtype and values).
int ihdr_bit_depth_buf(const unsigned char* head, size_t n) {
  static const unsigned char sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 26 || std::memcmp(head, sig, 8) != 0) return -1;
  return head[24];
}

// whole file -> malloc'd buffer (caller frees); nullptr on failure.  One
// open+read per image instead of three passes (the IHDR probe, libpng's
// own re-open, and its streamed chunk reads) — for the tiny per-row robot
// frames the syscall overhead was a large share of the 55 us/image decode.
unsigned char* read_file(const char* path, long* size) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    std::fclose(f);
    return nullptr;
  }
  unsigned char* buf = static_cast<unsigned char*>(std::malloc(sz));
  if (!buf) {
    std::fclose(f);
    return nullptr;
  }
  size_t got = std::fread(buf, 1, static_cast<size_t>(sz), f);
  std::fclose(f);
  if (got != static_cast<size_t>(sz)) {
    std::free(buf);
    return nullptr;
  }
  *size = sz;
  return buf;
}

// decode one in-memory PNG into out (cap bytes).  Same return codes as
// fast_png_decode; dims are filled whenever the header parses.
int decode_mem(const unsigned char* data, long size, unsigned char* out,
               long cap, int* h, int* w, int* c) {
  if (ihdr_bit_depth_buf(data, static_cast<size_t>(size)) != 8) return -2;
  png_image im;
  std::memset(&im, 0, sizeof im);
  im.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&im, data,
                                        static_cast<size_t>(size))) {
    png_image_free(&im);
    return -1;
  }
  const int ch = PNG_IMAGE_PIXEL_CHANNELS(im.format);
  *h = static_cast<int>(im.height);
  *w = static_cast<int>(im.width);
  if (ch == 2 || ch == 4 ||
      (im.format & (PNG_FORMAT_FLAG_LINEAR | PNG_FORMAT_FLAG_COLORMAP))) {
    png_image_free(&im);
    return -2;
  }
  im.format = (ch >= 3) ? PNG_FORMAT_RGB : PNG_FORMAT_GRAY;
  *c = (ch >= 3) ? 3 : 1;
  const long need = static_cast<long>(PNG_IMAGE_SIZE(im));
  if (need > cap) {
    png_image_free(&im);
    return -3;
  }
  if (!png_image_finish_read(&im, nullptr, out, 0, nullptr)) {
    png_image_free(&im);
    return -4;
  }
  return 0;
}

}  // namespace

extern "C" {

// Probe height/width/output-channels. Returns 0 on success, negative on
// failure (unreadable, or alpha present -> caller falls back).  Stays on
// the streamed libpng file API: a dims probe needs only the header, and
// slurping a whole 0.9 MB camera frame to answer a 26-byte question would
// double the first image's I/O in every decode_batch call.
int fast_png_dims(const char* path, int* h, int* w, int* c) {
  unsigned char head[26];
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t n = std::fread(head, 1, sizeof head, f);
  std::fclose(f);
  if (ihdr_bit_depth_buf(head, n) != 8) return -2;  // plain 8-bit only
  png_image im;
  std::memset(&im, 0, sizeof im);
  im.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&im, path)) {
    png_image_free(&im);
    return -1;
  }
  const int ch = PNG_IMAGE_PIXEL_CHANNELS(im.format);
  *h = static_cast<int>(im.height);
  *w = static_cast<int>(im.width);
  // defer to PIL for anything whose numpy view would differ from a plain
  // 8-bit gray/RGB conversion: alpha channels, 16-bit (LINEAR) samples
  // (PIL returns raw uint16), and palette images (PIL returns indices)
  const bool unsupported =
      ch == 2 || ch == 4 ||
      (im.format & (PNG_FORMAT_FLAG_LINEAR | PNG_FORMAT_FLAG_COLORMAP));
  if (!unsupported) *c = (ch >= 3) ? 3 : 1;
  png_image_free(&im);
  return unsupported ? -2 : 0;
}

// Decode into an 8-bit H*W*C buffer (C in {1,3}); returns 0 on success,
// -1 unreadable, -2 unsupported format (alpha/palette/non-8-bit),
// -3 buffer too small, -4 decode error.  On -3 the dims ARE filled in, so
// one probe-free call with a typical-size scratch buffer suffices for the
// common case and the retry knows the exact size.
int fast_png_decode(const char* path, unsigned char* out, long cap,
                    int* h, int* w, int* c) {
  long size = 0;
  unsigned char* data = read_file(path, &size);
  if (!data) return -1;
  int rc = decode_mem(data, size, out, cap, h, w, c);
  std::free(data);
  return rc;
}

// Decode a BATCH of PNGs in one call: paths are NUL-separated in
// `paths_blob` (offsets[i] = start of path i), each image decodes into
// out + i*cap_each, with per-image dims and return codes (same codes as
// fast_png_decode) in hs/ws/cs/rcs.  Always returns 0 — per-image
// failures are the caller's to resolve (PIL fallback).  n_threads > 1
// fans images across std::thread workers (ctypes released the GIL for
// the whole call, so this scales with host cores); on a 1-core host it
// still amortizes the per-call Python/ctypes overhead of the hot loop.
int fast_png_decode_batch(const char* paths_blob, const long* offsets,
                          int n, unsigned char* out, long cap_each,
                          int* hs, int* ws, int* cs, int* rcs,
                          int n_threads) {
  auto worker = [&](int i0, int i1) {
    for (int i = i0; i < i1; ++i) {
      long size = 0;
      unsigned char* data = read_file(paths_blob + offsets[i], &size);
      if (!data) {
        rcs[i] = -1;
        continue;
      }
      rcs[i] = decode_mem(data, size, out + static_cast<long>(i) * cap_each,
                          cap_each, hs + i, ws + i, cs + i);
      std::free(data);
    }
  };
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  if (n_threads <= 1) {
    worker(0, n);
  } else {
    std::vector<std::thread> pool;
    int chunk = (n + n_threads - 1) / n_threads;
    int unstarted = 0;  // first index not yet claimed by a spawned thread
    for (int t = 0; t < n_threads; ++t) {
      int i0 = t * chunk;
      int i1 = i0 + chunk < n ? i0 + chunk : n;
      if (i0 >= i1) break;
      try {
        pool.emplace_back(worker, i0, i1);
      } catch (const std::system_error&) {
        break;  // thread creation failed: finish the rest serially
      }
      unstarted = i1;
    }
    for (auto& th : pool) th.join();
    if (unstarted < n) worker(unstarted, n);
  }
  return 0;
}

}  // extern "C"
