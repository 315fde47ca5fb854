// Native data-loader hot path: JPEG decode + bilinear staging resize.
//
// TPU-native replacement for the reference's native data dependencies —
// jpeg4py/libturbojpeg decode (detection_dataset.py:3,23) and OpenCV resize
// (functional/img.py:8-17).  A thread pool decodes a batch of files and
// writes directly into one preallocated uint8 [B, H, W, 3] staging buffer,
// so python sees a single zero-copy numpy array ready for device upload.
//
// Exposed as C symbols for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB; returns malloc'd buffer (caller frees).
// When target dims (tw, th) are positive, decodes at the smallest libjpeg
// DCT scale (num/8) whose output still covers the target in both dims —
// the IDCT then does most of the downsampling work (large speedup, proper
// low-pass). orig_w/orig_h receive the ORIGINAL dims (for box rescaling);
// width/height receive the decoded dims.
uint8_t* decode_jpeg(const char* path, int* width, int* height,
                     int tw, int th, int* orig_w, int* orig_h) {
  FILE* file = std::fopen(path, "rb");
  if (!file) return nullptr;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  // volatile: modified after setjmp and read in the longjmp error path —
  // without it the error path could free an indeterminate pointer
  uint8_t* volatile buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(file);
    std::free(buffer);
    return nullptr;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, file);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // IFAST IDCT: ~1 LSB quality difference, measurably faster scalar path;
  // the staging resize low-passes the result anyway
  cinfo.dct_method = JDCT_IFAST;
  if (tw > 0 && th > 0) {
    // classic libjpeg (v62 ABI) supports only 1/1, 1/2, 1/4, 1/8 —
    // pick the largest denominator whose output still covers the target
    int denom = 1;
    for (int d = 8; d >= 1; d /= 2) {
      const long sw = (cinfo.image_width + d - 1) / d;
      const long sh = (cinfo.image_height + d - 1) / d;
      if (sw >= tw && sh >= th) { denom = d; break; }
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);

  if (orig_w) *orig_w = cinfo.image_width;
  if (orig_h) *orig_h = cinfo.image_height;
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const size_t stride = static_cast<size_t>(*width) * 3;
  buffer = static_cast<uint8_t*>(std::malloc(stride * *height));

  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(file);
  return buffer;
}

// Bilinear resize RGB uint8 (same sampling convention as cv2.resize /
// data/transforms.py sample_view: src = (dst + 0.5) * scale - 0.5).
// Fixed-point 8.8 with per-column offsets/weights hoisted out of the row
// loop (the scalar per-pixel float version dominated staging time on
// single-core hosts; agrees with the float path within 1 LSB).
void resize_bilinear(const uint8_t* src, int sw, int sh,
                     uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0(dw), x1(dw), wx1(dw);
  for (int x = 0; x < dw; ++x) {
    const float fx = (x + 0.5f) * sx - 0.5f;
    const int xi = static_cast<int>(std::floor(fx));
    wx1[x] = static_cast<int>((fx - xi) * 256.0f + 0.5f);
    x0[x] = std::clamp(xi, 0, sw - 1) * 3;
    x1[x] = std::clamp(xi + 1, 0, sw - 1) * 3;
  }
  for (int y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int yi = static_cast<int>(std::floor(fy));
    const int wy1 = static_cast<int>((fy - yi) * 256.0f + 0.5f);
    const int wy0 = 256 - wy1;
    const uint8_t* r0 =
        src + static_cast<size_t>(std::clamp(yi, 0, sh - 1)) * sw * 3;
    const uint8_t* r1 =
        src + static_cast<size_t>(std::clamp(yi + 1, 0, sh - 1)) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const int w1 = wx1[x];
      const int w0 = 256 - w1;
      const uint8_t* p00 = r0 + x0[x];
      const uint8_t* p01 = r0 + x1[x];
      const uint8_t* p10 = r1 + x0[x];
      const uint8_t* p11 = r1 + x1[x];
      for (int c = 0; c < 3; ++c) {
        const int top = p00[c] * w0 + p01[c] * w1;  // 8.8
        const int bot = p10[c] * w0 + p11[c] * w1;
        out[x * 3 + c] =
            static_cast<uint8_t>((top * wy0 + bot * wy1 + (1 << 15)) >> 16);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `count` JPEG files, resize each to (dw, dh), write into
// out[b, dh, dw, 3].  orig_sizes[b*2+{0,1}] receives the ORIGINAL
// (width, height) — box rescaling needs the source frame.  When
// fast_scale != 0, the IDCT decodes directly at the smallest covering
// DCT scale (see decode_jpeg).  Returns the number of successfully decoded
// images; failures leave the slot zeroed with orig_sizes = 0 (python falls
// back for those).
int decode_batch(const char** paths, int count,
                 uint8_t* out, int dw, int dh,
                 int* orig_sizes, int num_threads, int fast_scale) {
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t slot = static_cast<size_t>(dw) * dh * 3;
  const int tw = fast_scale ? dw : 0;
  const int th = fast_scale ? dh : 0;

  auto worker = [&]() {
    while (true) {
      int b = next.fetch_add(1);
      if (b >= count) break;
      int w = 0, h = 0, ow = 0, oh = 0;
      uint8_t* img = decode_jpeg(paths[b], &w, &h, tw, th, &ow, &oh);
      if (!img) {
        std::memset(out + slot * b, 0, slot);
        orig_sizes[b * 2] = 0;
        orig_sizes[b * 2 + 1] = 0;
        continue;
      }
      orig_sizes[b * 2] = ow;
      orig_sizes[b * 2 + 1] = oh;
      if (w == dw && h == dh) {
        std::memcpy(out + slot * b, img, slot);
      } else {
        resize_bilinear(img, w, h, out + slot * b, dw, dh);
      }
      std::free(img);
      ok.fetch_add(1);
    }
  };

  int threads = std::max(1, std::min(num_threads, count));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int i = 0; i < threads; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return ok.load();
}

// Single-image decode into a caller buffer of capacity cap bytes (RGB).
// Returns 0 on success.
int decode_single(const char* path, uint8_t* out, long cap,
                  int* width, int* height) {
  int w = 0, h = 0;
  uint8_t* img = decode_jpeg(path, &w, &h, 0, 0, nullptr, nullptr);
  if (!img) return -1;
  long need = static_cast<long>(w) * h * 3;
  if (need > cap) {
    std::free(img);
    return -2;
  }
  std::memcpy(out, img, need);
  *width = w;
  *height = h;
  std::free(img);
  return 0;
}

}  // extern "C"
