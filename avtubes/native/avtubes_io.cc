// avtubes native IO core: threaded WAV decode/preparation + JPEG decode.
//
// The reference's input pipeline leans on native libraries behind Python
// (libsndfile via soundfile, libjpeg via PIL, ffmpeg via cv2) driven by
// torch DataLoader worker *processes*.  Here the equivalent hot loop is a
// C++ thread pool exposed via ctypes: batch WAV read + fixed-length
// preparation (downmix/tile/clip/truncate, matching
// avtubes.data.audio.prepare_waveform) writes straight into the caller's
// batch buffer, and JPEG frames decode straight to RGB without PIL object
// overhead.  No Python objects are touched off-thread, so the pool scales
// past the GIL.
//
// Build: make -C avtubes/native   (g++ -O3 -shared -fPIC -pthread -ljpeg)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct WavData {
  std::vector<float> samples;  // downmixed mono
  int samplerate = 0;
};

bool read_wav_file(const char* path, WavData* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return false;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t samplerate = 0;
  std::vector<uint8_t> data;
  uint8_t chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (!memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> body(size);
      if (fread(body.data(), 1, size, f) != size) break;
      memcpy(&audio_format, body.data(), 2);
      memcpy(&channels, body.data() + 2, 2);
      memcpy(&samplerate, body.data() + 4, 4);
      memcpy(&bits, body.data() + 14, 2);
      if (audio_format == 0xFFFE && size >= 40)
        memcpy(&audio_format, body.data() + 24, 2);
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else if (!memcmp(chunk, "data", 4)) {
      data.resize(size);
      size_t got = fread(data.data(), 1, size, f);
      data.resize(got);
      if (size & 1) fseek(f, 1, SEEK_CUR);
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!samplerate || !channels || data.empty()) return false;

  size_t n_frames;
  std::vector<float> mono;
  const double inv_ch = 1.0 / channels;
  if (audio_format == 1 && bits == 16 && channels == 1) {
    // the common case: mono PCM16 — a straight vectorizable scale loop
    const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
    n_frames = data.size() / 2;
    mono.resize(n_frames);
    constexpr float kInv = 1.0f / 32768.0f;
    for (size_t i = 0; i < n_frames; ++i) mono[i] = p[i] * kInv;
  } else if (audio_format == 1 && bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
    n_frames = data.size() / 2 / channels;
    mono.resize(n_frames);
    for (size_t i = 0; i < n_frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += p[i * channels + c] / 32768.0;
      mono[i] = static_cast<float>(acc * inv_ch);
    }
  } else if (audio_format == 1 && bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(data.data());
    n_frames = data.size() / 4 / channels;
    mono.resize(n_frames);
    for (size_t i = 0; i < n_frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c)
        acc += p[i * channels + c] / 2147483648.0;
      mono[i] = static_cast<float>(acc * inv_ch);
    }
  } else if (audio_format == 3 && bits == 32) {
    const float* p = reinterpret_cast<const float*>(data.data());
    n_frames = data.size() / 4 / channels;
    mono.resize(n_frames);
    for (size_t i = 0; i < n_frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += p[i * channels + c];
      mono[i] = static_cast<float>(acc * inv_ch);
    }
  } else {
    return false;  // 8/24-bit stays on the numpy fallback path
  }
  out->samples = std::move(mono);
  out->samplerate = static_cast<int>(samplerate);
  return true;
}

// prepare_waveform semantics (avtubes/data/audio.py): tile short audio,
// clip to [-1, 1], truncate to samplerate * seconds... but the *output*
// buffer is fixed at out_len samples (the caller sizes it for the dataset's
// nominal samplerate); shorter prepared signals zero-pad the tail.
void prepare_into(const WavData& wav, int seconds, float* out, int64_t out_len) {
  const int64_t target = static_cast<int64_t>(wav.samplerate) * seconds;
  const int64_t n = static_cast<int64_t>(wav.samples.size());
  const int64_t fill = std::min(target, out_len);
  if (n == 0) {
    memset(out, 0, out_len * sizeof(float));
    return;
  }
  // tiling as block copies (a per-sample modulo defeats vectorization)
  const float* src = wav.samples.data();
  int64_t pos = 0;
  while (pos < fill) {
    const int64_t chunk = std::min(n, fill - pos);
    float* dst = out + pos;
    for (int64_t i = 0; i < chunk; ++i) {
      float v = src[i];
      dst[i] = v > 1.f ? 1.f : (v < -1.f ? -1.f : v);
    }
    pos += chunk;
  }
  if (fill < out_len) memset(out + fill, 0, (out_len - fill) * sizeof(float));
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

}  // namespace

extern "C" {

// Decode + prepare one WAV. Returns samplerate, or 0 on failure.
int avt_decode_wav(const char* path, int seconds, float* out, int64_t out_len) {
  WavData wav;
  if (!read_wav_file(path, &wav)) return 0;
  prepare_into(wav, seconds, out, out_len);
  return wav.samplerate;
}

// Batch decode+prepare: paths is n pointers; out is (n, out_len) row-major;
// rates receives per-item samplerate (0 = failed). Runs on `threads` threads.
void avt_decode_wav_batch(const char** paths, int n, int seconds, float* out,
                          int64_t out_len, int* rates, int threads) {
  std::atomic<int> next(0);
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      rates[i] = avt_decode_wav(paths[i], seconds, out + (int64_t)i * out_len,
                                out_len);
    }
  };
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int t = std::max(1, std::min({threads, n, hw > 0 ? hw : 1}));
  if (t == 1) {  // single-core: run inline, no thread churn
    work();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int k = 0; k < t; ++k) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

// Probe JPEG dimensions. Returns 1 on success.
int avt_jpeg_size(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 1;
}

// Decode a JPEG to RGB uint8 into out (must hold h*w*3). Returns 1 on success.
int avt_decode_jpeg(const char* path, uint8_t* out, int out_h, int out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != out_h || (int)cinfo.output_width != out_w ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (int64_t)cinfo.output_scanline * out_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 1;
}

// Batch JPEG decode on a thread pool: all images must share (h, w).
// ok[i] = 1 on success. out is (n, h, w, 3) row-major.
void avt_decode_jpeg_batch(const char** paths, int n, uint8_t* out, int h,
                           int w, int* ok, int threads) {
  std::atomic<int> next(0);
  auto work = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      ok[i] = avt_decode_jpeg(paths[i], out + (int64_t)i * h * w * 3, h, w);
    }
  };
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int t = std::max(1, std::min({threads, n, hw > 0 ? hw : 1}));
  if (t == 1) {  // single-core: run inline, no thread churn
    work();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int k = 0; k < t; ++k) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
