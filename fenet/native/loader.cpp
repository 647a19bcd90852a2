// fenet native data loader: PNG decode + preprocess + batch assembly.
//
// Native runtime counterpart of the reference's host input path (torch
// DataLoader workers + cv2 decode, train.py:82-83, datasets_old.py:30-35).
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in this
// image). All outputs are float32, HWC, raw 0..255 — the reference's exact
// value convention (no /255, no normalization).
//
// Build: fenet/native/__init__.py compiles this on first use, mirroring the
// reference's JIT extension fallback (dist_chamfer_3D.py:6-24).

#include <png.h>

#include <algorithm>
#include <atomic>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Decode one PNG to 8-bit RGB. Returns false on any error.
bool decode_png_rgb(const char* path, std::vector<uint8_t>* out, int* w,
                    int* h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->resize(size_t(*w) * *h * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = out->data() + size_t(y) * *w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// Decode + reference preprocessing: crop [4:-5, 4:-5] of a 137x137 render
// (any size >= 137 works: crop top 4 / bottom 5 rows & cols), emit float32
// HWC 128x128x3.
bool load_shapenet_image(const char* path, float* dst) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_png_rgb(path, &rgb, &w, &h)) return false;
  const int y0 = 4, x0 = 4;
  const int out_h = h - 9, out_w = w - 9;
  if (out_h != 128 || out_w != 128) return false;
  for (int y = 0; y < 128; ++y) {
    const uint8_t* src = rgb.data() + (size_t(y + y0) * w + x0) * 3;
    float* d = dst + size_t(y) * 128 * 3;
    for (int x = 0; x < 128 * 3; ++x) d[x] = float(src[x]);
  }
  return true;
}

// Minimal .npy reader for little-endian float32/float64 C-order arrays.
bool load_npy_f32(const char* path, float* dst, int64_t expected) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[8];
  if (std::fread(magic, 1, 8, fp) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(fp);
    return false;
  }
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint8_t b[2];
    if (std::fread(b, 1, 2, fp) != 2) { std::fclose(fp); return false; }
    header_len = b[0] | (b[1] << 8);
  } else {
    uint8_t b[4];
    if (std::fread(b, 1, 4, fp) != 4) { std::fclose(fp); return false; }
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
  }
  std::string header(header_len, '\0');
  if (std::fread(header.data(), 1, header_len, fp) != header_len) {
    std::fclose(fp);
    return false;
  }
  bool f8 = header.find("<f8") != std::string::npos;
  if (!f8 && header.find("<f4") == std::string::npos) {
    std::fclose(fp);
    return false;
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    std::fclose(fp);
    return false;
  }
  bool ok = true;
  if (f8) {
    std::vector<double> tmp(expected);
    ok = std::fread(tmp.data(), 8, expected, fp) == size_t(expected);
    if (ok)
      for (int64_t i = 0; i < expected; ++i) dst[i] = float(tmp[i]);
  } else {
    ok = std::fread(dst, 4, expected, fp) == size_t(expected);
  }
  std::fclose(fp);
  return ok;
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  int workers = std::min(n_threads, n);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Batch image load: paths is n concatenated NUL-terminated strings.
// out: (n, 128, 128, 3) float32. Returns the number of failures.
int fenet_load_images(const char* paths, int n, float* out, int n_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += std::strlen(p) + 1;
  }
  std::atomic<int> failures(0);
  parallel_for(n, n_threads, [&](int i) {
    if (!load_shapenet_image(ptrs[i], out + size_t(i) * 128 * 128 * 3))
      failures.fetch_add(1);
  });
  return failures.load();
}

// Batch cloud load: each file holds (points, 3) float32/64; out is
// (n, points, 3) float32. Returns the number of failures.
int fenet_load_clouds(const char* paths, int n, int points, float* out,
                      int n_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += std::strlen(p) + 1;
  }
  std::atomic<int> failures(0);
  parallel_for(n, n_threads, [&](int i) {
    if (!load_npy_f32(ptrs[i], out + size_t(i) * points * 3,
                      int64_t(points) * 3))
      failures.fetch_add(1);
  });
  return failures.load();
}

int fenet_loader_version() { return 1; }

}  // extern "C"
