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
// Build: g++ -O3 -std=c++17 -shared -fPIC native/fast_png.cpp -lpng -o
//        native/libfastpng.so

#include <cstdio>
#include <cstring>
#include <png.h>

namespace {

// IHDR bit depth straight from the file header (byte 24 after the 8-byte
// signature + IHDR chunk header); -1 when unreadable / not a PNG.  The
// simplified libpng API hides bit depth, but sub-8-bit grayscale must be
// deferred to PIL (PIL yields bool/low-depth arrays where libpng would
// expand to uint8 0/255 — different dtype and values).
int ihdr_bit_depth(const char* path) {
  unsigned char head[26];
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  size_t n = std::fread(head, 1, sizeof head, f);
  std::fclose(f);
  static const unsigned char sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < sizeof head || std::memcmp(head, sig, 8) != 0) return -1;
  return head[24];
}

}  // namespace

extern "C" {

// Probe height/width/output-channels. Returns 0 on success, negative on
// failure (unreadable, or alpha present -> caller falls back).
int fast_png_dims(const char* path, int* h, int* w, int* c) {
  if (ihdr_bit_depth(path) != 8) return -2;  // only plain 8-bit handled here
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
  if (ch == 2 || ch == 4 ||
      (im.format & (PNG_FORMAT_FLAG_LINEAR | PNG_FORMAT_FLAG_COLORMAP))) {
    png_image_free(&im);
    return -2;
  }
  *c = (ch >= 3) ? 3 : 1;
  png_image_free(&im);
  return 0;
}

// Decode into an 8-bit H*W*C buffer (C in {1,3}); returns 0 on success,
// -1 unreadable, -2 unsupported format (alpha/palette/non-8-bit),
// -3 buffer too small, -4 decode error.  On -3 the dims ARE filled in, so
// one probe-free call with a typical-size scratch buffer suffices for the
// common case and the retry knows the exact size (halves the per-image
// open+header-parse overhead of a separate dims() probe in the hot loop).
int fast_png_decode(const char* path, unsigned char* out, long cap,
                    int* h, int* w, int* c) {
  if (ihdr_bit_depth(path) != 8) return -2;
  png_image im;
  std::memset(&im, 0, sizeof im);
  im.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&im, path)) {
    png_image_free(&im);
    return -1;
  }
  const int ch = PNG_IMAGE_PIXEL_CHANNELS(im.format);
  if (ch == 2 || ch == 4 ||
      (im.format & (PNG_FORMAT_FLAG_LINEAR | PNG_FORMAT_FLAG_COLORMAP))) {
    png_image_free(&im);
    return -2;
  }
  im.format = (ch >= 3) ? PNG_FORMAT_RGB : PNG_FORMAT_GRAY;
  *h = static_cast<int>(im.height);
  *w = static_cast<int>(im.width);
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
  return 0;  // dims already filled in above
}

}  // extern "C"
