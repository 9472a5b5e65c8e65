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

// ---------------------------------------------------------------------- //
// Animated GIF89a encoder for grayscale frame stacks (the sampling-process
// videos). Global 256-gray palette, real LZW (variable 9..12-bit codes,
// trie dictionary with per-reset O(4096) clear), one image block per frame
// with a "do not dispose" graphic control extension and a NETSCAPE2.0
// infinite-loop extension. Replaces imageio's per-frame quantize+encode,
// which dominates diffusion evaluate() wall-clock on a 1-core host.
// ---------------------------------------------------------------------- //

namespace {

struct ByteSink {
  uint8_t* buf;
  int64_t cap;
  int64_t len = 0;
  bool overflow = false;
  void put(uint8_t b) {
    if (len >= cap) { overflow = true; return; }
    buf[len++] = b;
  }
  void put_u16(uint16_t v) { put((uint8_t)(v & 0xFF)); put((uint8_t)(v >> 8)); }
  void put_bytes(const void* p, int64_t n) {
    if (len + n > cap) { overflow = true; return; }
    std::memcpy(buf + len, p, (size_t)n);
    len += n;
  }
};

// LZW code stream packed LSB-first, flushed into <=255-byte sub-blocks.
struct SubBlockBitWriter {
  ByteSink& out;
  uint32_t acc = 0;
  int nbits = 0;
  uint8_t block[255];
  int blen = 0;
  explicit SubBlockBitWriter(ByteSink& s) : out(s) {}
  void put_byte(uint8_t b) {
    block[blen++] = b;
    if (blen == 255) flush_block();
  }
  void flush_block() {
    if (blen == 0) return;
    out.put((uint8_t)blen);
    out.put_bytes(block, blen);
    blen = 0;
  }
  void put_code(uint32_t code, int width) {
    acc |= code << nbits;
    nbits += width;
    while (nbits >= 8) {
      put_byte((uint8_t)(acc & 0xFF));
      acc >>= 8;
      nbits -= 8;
    }
  }
  void finish() {
    if (nbits > 0) put_byte((uint8_t)(acc & 0xFF));
    flush_block();
    out.put(0);  // block terminator
  }
};

// One frame of 8-bit palette indices -> LZW image data sub-blocks.
// Dictionary is a child-list trie over the 4096 code slots; resetting it is
// an O(4096) fill, not a 1M-entry table wipe.
void lzw_encode_frame(const uint8_t* px, int64_t n, ByteSink& out) {
  constexpr int kClear = 256, kEof = 257, kMaxCode = 4096;
  int16_t first_child[kMaxCode];
  int16_t next_sibling[kMaxCode];
  uint8_t suffix[kMaxCode];
  int next_code, width;
  auto reset = [&] {
    for (int i = 0; i < kMaxCode; ++i) first_child[i] = -1;
    next_code = kEof + 1;
    width = 9;
  };
  out.put(8);  // LZW minimum code size
  SubBlockBitWriter bw(out);
  reset();
  bw.put_code(kClear, width);
  int prefix = px[0];
  for (int64_t i = 1; i < n; ++i) {
    const uint8_t c = px[i];
    int node = first_child[prefix];
    while (node != -1 && suffix[node] != c) node = next_sibling[node];
    if (node != -1) {
      prefix = node;
      continue;
    }
    bw.put_code((uint32_t)prefix, width);
    if (next_code < kMaxCode) {
      if (next_code == (1 << width)) ++width;  // gifenc-style early grow
      suffix[next_code] = c;
      next_sibling[next_code] = first_child[prefix];
      first_child[prefix] = (int16_t)next_code;
      ++next_code;
    } else {
      bw.put_code(kClear, width);
      reset();
    }
    prefix = c;
  }
  bw.put_code((uint32_t)prefix, width);
  if (next_code == (1 << width) && width < 12) ++width;
  bw.put_code(kEof, width);
  bw.finish();
}

}  // namespace

// Encode (t, h, w) uint8 grayscale frames as an animated GIF89a.
// delay_cs: per-frame delay in 1/100 s. loop_count: 0 = loop forever.
// Returns bytes written, or -1 if out_cap is too small (caller should size
// out_cap >= t*h*w*3/2 + t*64 + 2048; LZW worst case is 12 bits/pixel).
int64_t gmt_gif_encode_gray(const uint8_t* frames, int64_t t, int64_t h,
                            int64_t w, int delay_cs, int loop_count,
                            uint8_t* out, int64_t out_cap) {
  if (t <= 0 || h <= 0 || w <= 0 || h > 0xFFFF || w > 0xFFFF) return -1;
  ByteSink s{out, out_cap};
  s.put_bytes("GIF89a", 6);
  s.put_u16((uint16_t)w);
  s.put_u16((uint16_t)h);
  s.put(0xF7);  // global color table, 8 bits/entry, 256 entries
  s.put(0);     // background color index
  s.put(0);     // pixel aspect ratio
  for (int i = 0; i < 256; ++i) {  // gray ramp palette: index == intensity
    s.put((uint8_t)i);
    s.put((uint8_t)i);
    s.put((uint8_t)i);
  }
  // NETSCAPE2.0 application extension: animation loop count
  static const uint8_t kNetscape[] = {0x21, 0xFF, 0x0B, 'N', 'E', 'T', 'S',
                                      'C', 'A', 'P', 'E', '2', '.', '0',
                                      0x03, 0x01};
  s.put_bytes(kNetscape, sizeof(kNetscape));
  s.put_u16((uint16_t)loop_count);
  s.put(0);
  for (int64_t f = 0; f < t; ++f) {
    // graphic control: disposal "do not dispose", no transparency
    s.put(0x21);
    s.put(0xF9);
    s.put(4);
    s.put(0x04);
    s.put_u16((uint16_t)delay_cs);
    s.put(0);
    s.put(0);
    // image descriptor: full-canvas frame, no local color table
    s.put(0x2C);
    s.put_u16(0);
    s.put_u16(0);
    s.put_u16((uint16_t)w);
    s.put_u16((uint16_t)h);
    s.put(0);
    lzw_encode_frame(frames + f * h * w, h * w, s);
    if (s.overflow) return -1;
  }
  s.put(0x3B);  // trailer
  return s.overflow ? -1 : s.len;
}

int gmt_version() { return 2; }

}  // extern "C"
