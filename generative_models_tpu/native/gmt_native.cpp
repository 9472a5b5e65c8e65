// Native host-side data runtime for generative_models_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host side
// of the pipeline — IDX (MNIST container) decoding, pixel transforms, and
// image-grid tiling — so feeding the device never bottlenecks on
// interpreted Python. Exposed through ctypes (see native/__init__.py);
// every entry point has a pure-numpy fallback.
//
// Build: make -C generative_models_tpu/native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// Parse an IDX header. buf/len: raw file bytes. Writes up to 8 dims.
// Returns the byte offset of the payload, or -1 on a malformed header.
// dtype_out gets the IDX type code (0x08 = uint8, 0x0D = float32, ...).
long long gmt_idx_header(const uint8_t* buf, size_t len, int64_t* dims_out,
                         int* ndim_out, int* dtype_out) {
  if (len < 4 || buf[0] != 0 || buf[1] != 0) return -1;
  const int dtype = buf[2];
  const int ndim = buf[3];
  if (ndim <= 0 || ndim > 8) return -1;
  const size_t header = 4 + 4 * (size_t)ndim;
  if (len < header) return -1;
  for (int i = 0; i < ndim; ++i) {
    const uint8_t* p = buf + 4 + 4 * i;
    dims_out[i] = ((int64_t)p[0] << 24) | ((int64_t)p[1] << 16) |
                  ((int64_t)p[2] << 8) | (int64_t)p[3];
  }
  *ndim_out = ndim;
  *dtype_out = dtype;
  return (long long)header;
}

// uint8 -> float32 with scaling (e.g. 1/255).
void gmt_u8_to_f32(const uint8_t* in, float* out, size_t n, float scale) {
  for (size_t i = 0; i < n; ++i) out[i] = (float)in[i] * scale;
}

// uint8 -> float32 binarized at a uint8 threshold (reference semantics:
// (x/255 > 0.5) -> x > 127.5 -> x >= 128).
void gmt_u8_binarize(const uint8_t* in, float* out, size_t n,
                     float thresh01) {
  const float t = thresh01 * 255.0f;
  for (size_t i = 0; i < n; ++i) out[i] = in[i] > t ? 1.0f : 0.0f;
}

// uint8 -> float32 scaled into [-1, 1] (2*x/255 - 1).
void gmt_u8_to_pm1(const uint8_t* in, float* out, size_t n) {
  const float s = 2.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) out[i] = (float)in[i] * s - 1.0f;
}

// Tile (n1*n2, h, w, c) float images into one (n1*h, n2*w, c) canvas.
void gmt_tile_grid(const float* imgs, float* out, int64_t n1, int64_t n2,
                   int64_t h, int64_t w, int64_t c) {
  const int64_t row_px = n2 * w * c;
  for (int64_t i = 0; i < n1; ++i) {
    for (int64_t j = 0; j < n2; ++j) {
      const float* src = imgs + ((i * n2 + j) * h * w * c);
      for (int64_t r = 0; r < h; ++r) {
        float* dst = out + (i * h + r) * row_px + j * w * c;
        std::memcpy(dst, src + r * w * c, sizeof(float) * (size_t)(w * c));
      }
    }
  }
}

// Tile + convert to uint8 in one pass (viz hot path: 784-frame GIF stacks).
// Input range [0,1]; clamps.
void gmt_tile_grid_u8(const float* imgs, uint8_t* out, int64_t n1,
                      int64_t n2, int64_t h, int64_t w, int64_t c) {
  const int64_t row_px = n2 * w * c;
  for (int64_t i = 0; i < n1; ++i) {
    for (int64_t j = 0; j < n2; ++j) {
      const float* src = imgs + ((i * n2 + j) * h * w * c);
      for (int64_t r = 0; r < h; ++r) {
        uint8_t* dst = out + (i * h + r) * row_px + j * w * c;
        const float* s = src + r * w * c;
        for (int64_t k = 0; k < w * c; ++k) {
          float v = s[k];
          v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
          dst[k] = (uint8_t)(v * 255.0f + 0.5f);
        }
      }
    }
  }
}

int gmt_version() { return 1; }

}  // extern "C"
