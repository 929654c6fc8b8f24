// Native WAV decoding for the training data pipeline.
//
// The reference loads audio per-item in Python worker processes (torch
// DataLoader). Here decoding is a C++ shared library driven through ctypes:
// the GIL is released for the duration of each call, so a plain Python
// thread pool gets true parallel file decoding — the host-side input
// pipeline keeps up with the TPU without multiprocessing overhead.
//
// Supports RIFF/WAVE with PCM 16/24/32-bit and IEEE float32, any channel
// count (mono-mixed), and in-decoder linear resampling to the target rate.
// Build: `make -C facodec_tpu/native` (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
  FILE* f = nullptr;
  ~Reader() {
    if (f) fclose(f);
  }
  bool read(void* dst, size_t n) { return fread(dst, 1, n, f) == n; }
  bool skip(long n) { return fseek(f, n, SEEK_CUR) == 0; }
};

struct Fmt {
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

// Parse up to the data chunk. Returns data byte count, or 0 on failure.
uint32_t parse_header(Reader& r, Fmt* fmt) {
  char id[4];
  uint32_t sz;
  if (!r.read(id, 4) || memcmp(id, "RIFF", 4)) return 0;
  if (!r.read(&sz, 4)) return 0;
  if (!r.read(id, 4) || memcmp(id, "WAVE", 4)) return 0;
  bool have_fmt = false;
  while (r.read(id, 4) && r.read(&sz, 4)) {
    if (!memcmp(id, "fmt ", 4)) {
      struct __attribute__((packed)) {
        uint16_t format, channels;
        uint32_t rate, byte_rate;
        uint16_t block, bits;
      } h;
      if (sz < sizeof(h) || !r.read(&h, sizeof(h))) return 0;
      if (sz > sizeof(h) && !r.skip(sz - sizeof(h))) return 0;
      fmt->format = h.format == 0xFFFE ? 1 : h.format;  // extensible -> PCM
      fmt->channels = h.channels;
      fmt->sample_rate = h.rate;
      fmt->bits = h.bits;
      have_fmt = true;
    } else if (!memcmp(id, "data", 4)) {
      return have_fmt ? sz : 0;
    } else {
      if (!r.skip(sz + (sz & 1))) return 0;
    }
  }
  return 0;
}

inline float decode_sample(const uint8_t* p, const Fmt& fmt) {
  switch (fmt.bits) {
    case 16: {
      int16_t v;
      memcpy(&v, p, 2);
      return v / 32768.0f;
    }
    case 24: {
      int32_t v = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
      return (v >> 8) / 8388608.0f;
    }
    case 32: {
      if (fmt.format == 3) {
        float v;
        memcpy(&v, p, 4);
        return v;
      }
      int32_t v;
      memcpy(&v, p, 4);
      return v / 2147483648.0f;
    }
    default:
      return 0.0f;
  }
}

}  // namespace

extern "C" {

// Returns mono frame count at `target_sr` (0 = native rate), or -1 on error.
// Call with out=nullptr to query the length, then again with a buffer.
int64_t facodec_wav_read(const char* path, int32_t target_sr, float* out,
                         int64_t out_capacity, int32_t* native_sr) {
  Reader r;
  r.f = fopen(path, "rb");
  if (!r.f) return -1;
  Fmt fmt;
  uint32_t data_bytes = parse_header(r, &fmt);
  if (!data_bytes || !fmt.channels || !fmt.sample_rate) return -1;
  if (fmt.bits != 16 && fmt.bits != 24 && fmt.bits != 32) return -1;
  if (native_sr) *native_sr = (int32_t)fmt.sample_rate;

  const size_t bytes_per = fmt.bits / 8;
  const size_t frame_bytes = bytes_per * fmt.channels;
  const int64_t n_in = (int64_t)(data_bytes / frame_bytes);
  const int64_t n_out =
      (target_sr <= 0 || (uint32_t)target_sr == fmt.sample_rate)
          ? n_in
          : (int64_t)((double)n_in * target_sr / fmt.sample_rate);
  if (!out) return n_out;
  if (out_capacity < n_out) return -1;

  std::vector<uint8_t> raw(data_bytes);
  if (!r.read(raw.data(), data_bytes)) return -1;

  // decode + mono mix
  std::vector<float> mono((size_t)n_in);
  const float inv_ch = 1.0f / fmt.channels;
  for (int64_t i = 0; i < n_in; ++i) {
    const uint8_t* p = raw.data() + i * frame_bytes;
    float acc = 0.0f;
    for (uint16_t c = 0; c < fmt.channels; ++c)
      acc += decode_sample(p + c * bytes_per, fmt);
    mono[(size_t)i] = acc * inv_ch;
  }

  if (n_out == n_in) {
    memcpy(out, mono.data(), (size_t)n_in * sizeof(float));
    return n_out;
  }
  // linear resample to target_sr
  const double step = (double)fmt.sample_rate / target_sr;
  for (int64_t i = 0; i < n_out; ++i) {
    double pos = i * step;
    int64_t j = (int64_t)pos;
    double frac = pos - j;
    float a = mono[(size_t)(j < n_in ? j : n_in - 1)];
    float b = mono[(size_t)(j + 1 < n_in ? j + 1 : n_in - 1)];
    out[i] = (float)(a * (1.0 - frac) + b * frac);
  }
  return n_out;
}

}  // extern "C"
