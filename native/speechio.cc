// speechio: native audio I/O + prep for the TPU input pipeline.
//
// The reference's data path is librosa/soundfile/torch DataLoader worker
// processes (I_ea/main.py:96-101, I_da/scripts/train.py:215-232). Here the
// host-side hot loop — wav decode, polyphase resample, peak normalize,
// random crop assembly — is a small C++ library driven from Python via
// ctypes, with an internal thread pool so batch assembly saturates host
// cores without Python-level multiprocessing.
//
// C ABI (all functions return 0 on success, negative error codes otherwise):
//   si_wav_info(path, *sr, *frames)
//   si_load_wav(path, target_sr, out, out_capacity, *out_len)  // float32
//   si_resample(in, in_len, sr, target_sr, out, cap, *out_len)
//   si_peak_normalize(buf, len, level)
//   si_batch_crops(paths, n_paths, target_sr, normalize_level,
//                  starts, crop_len, out)   // threaded batch assembly
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrCapacity = -3;
constexpr int kErrArg = -4;

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

int parse_wav_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0)
    return kErrFormat;
  if (fread(&riff_size, 4, 1, f) != 1) return kErrFormat;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0)
    return kErrFormat;
  // chunk walk
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1)
      return kErrFormat;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t fmt, ch;
      uint32_t sr, byte_rate;
      uint16_t block, bits;
      if (size < 16) return kErrFormat;
      if (fread(&fmt, 2, 1, f) != 1 || fread(&ch, 2, 1, f) != 1 ||
          fread(&sr, 4, 1, f) != 1 || fread(&byte_rate, 4, 1, f) != 1 ||
          fread(&block, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return kErrFormat;
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      info->format = fmt;
      info->channels = ch;
      info->sample_rate = sr;
      info->bits = bits;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

int decode_wav(const char* path, std::vector<float>* out, int* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  WavInfo info;
  int rc = parse_wav_header(f, &info);
  if (rc != 0) {
    fclose(f);
    return rc;
  }
  const int bytes_per = info.bits / 8;
  if (bytes_per == 0 || info.channels == 0) {
    fclose(f);
    return kErrFormat;
  }
  const size_t n_frames = info.data_bytes / (bytes_per * info.channels);
  std::vector<uint8_t> raw(info.data_bytes);
  fseek(f, info.data_offset, SEEK_SET);
  size_t got = fread(raw.data(), 1, info.data_bytes, f);
  fclose(f);
  const size_t frames = got / (bytes_per * info.channels);
  out->resize(frames);
  const int ch = info.channels;
  if (info.format == 1 && info.bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(raw.data());
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      (*out)[i] = acc / (ch * 32768.0f);
    }
  } else if (info.format == 1 && info.bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
    for (size_t i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      (*out)[i] = static_cast<float>(acc / (ch * 2147483648.0));
    }
  } else if (info.format == 3 && info.bits == 32) {
    const float* p = reinterpret_cast<const float*>(raw.data());
    for (size_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) acc += p[i * ch + c];
      (*out)[i] = acc / ch;
    }
  } else {
    return kErrFormat;
  }
  *sr_out = static_cast<int>(info.sample_rate);
  (void)n_frames;
  return 0;
}

double sinc(double x) {
  if (std::abs(x) < 1e-12) return 1.0;
  const double px = M_PI * x;
  return std::sin(px) / px;
}

double i0(double x) {
  // modified Bessel I0 (series), for the Kaiser window
  double sum = 1.0, term = 1.0;
  const double half_x = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

uint64_t gcd_u64(uint64_t a, uint64_t b) {
  while (b) {
    uint64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// Polyphase resampling with a Kaiser-windowed sinc lowpass — the same
// scheme as scipy.signal.resample_poly (kaiser beta 5.0, 10 taps/phase).
void resample_poly(const float* in, int64_t in_len, int up, int down,
                   std::vector<float>* out) {
  const uint64_t g = gcd_u64(up, down);
  up /= g;
  down /= g;
  if (up == 1 && down == 1) {
    out->assign(in, in + in_len);
    return;
  }
  const int max_rate = std::max(up, down);
  const double f_c = 1.0 / max_rate;         // cutoff (Nyquist of low rate)
  const int half_len = 10 * max_rate;        // scipy's default proportions
  const double beta = 5.0;                   // scipy resample_poly default
  const int n_taps = 2 * half_len + 1;
  std::vector<double> h(n_taps);
  const double denom = i0(beta);
  double dc = 0.0;
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half_len;
    const double w =
        i0(beta * std::sqrt(std::max(
                      0.0, 1.0 - (m / half_len) * (m / half_len)))) /
        denom;
    h[i] = w * sinc(f_c * m);
    dc += h[i];
  }
  // firwin-style DC normalization (unit gain in the passband), then the
  // `up` factor scipy applies for the polyphase split
  for (int i = 0; i < n_taps; ++i) h[i] *= up / dc;
  const int64_t out_len =
      (in_len * static_cast<int64_t>(up) + down - 1) / down;
  out->assign(out_len, 0.f);
  // y[j] = sum_k h[j*down - k*up + half_len] * x[k]
  for (int64_t j = 0; j < out_len; ++j) {
    const int64_t t = static_cast<int64_t>(j) * down;
    // k range where 0 <= t - k*up + half_len < n_taps
    int64_t k_min = (t + half_len - (n_taps - 1) + up - 1) / up;
    int64_t k_max = (t + half_len) / up;
    k_min = std::max<int64_t>(k_min, 0);
    k_max = std::min<int64_t>(k_max, in_len - 1);
    double acc = 0.0;
    for (int64_t k = k_min; k <= k_max; ++k) {
      acc += h[t - k * up + half_len] * in[k];
    }
    (*out)[j] = static_cast<float>(acc);
  }
}

void load_resampled(const char* path, int target_sr, std::vector<float>* out,
                    int* rc_out) {
  std::vector<float> pcm;
  int sr = 0;
  int rc = decode_wav(path, &pcm, &sr);
  if (rc != 0) {
    *rc_out = rc;
    return;
  }
  if (target_sr > 0 && target_sr != sr) {
    resample_poly(pcm.data(), static_cast<int64_t>(pcm.size()), target_sr,
                  sr, out);
  } else {
    *out = std::move(pcm);
  }
  *rc_out = 0;
}

}  // namespace

extern "C" {

int si_wav_info(const char* path, int* sr, int64_t* frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  WavInfo info;
  int rc = parse_wav_header(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *sr = static_cast<int>(info.sample_rate);
  *frames = info.data_bytes / ((info.bits / 8) * info.channels);
  return 0;
}

int si_load_wav(const char* path, int target_sr, float* out,
                int64_t capacity, int64_t* out_len) {
  std::vector<float> buf;
  int rc = 0;
  load_resampled(path, target_sr, &buf, &rc);
  if (rc != 0) return rc;
  if (static_cast<int64_t>(buf.size()) > capacity) return kErrCapacity;
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  *out_len = static_cast<int64_t>(buf.size());
  return 0;
}

int si_resample(const float* in, int64_t in_len, int sr, int target_sr,
                float* out, int64_t capacity, int64_t* out_len) {
  if (sr <= 0 || target_sr <= 0) return kErrArg;
  std::vector<float> buf;
  resample_poly(in, in_len, target_sr, sr, &buf);
  if (static_cast<int64_t>(buf.size()) > capacity) return kErrCapacity;
  std::memcpy(out, buf.data(), buf.size() * sizeof(float));
  *out_len = static_cast<int64_t>(buf.size());
  return 0;
}

int si_peak_normalize(float* buf, int64_t len, float level) {
  float peak = 0.f;
  for (int64_t i = 0; i < len; ++i) peak = std::max(peak, std::abs(buf[i]));
  if (peak <= 0.f) return 0;
  const float s = level / peak;
  for (int64_t i = 0; i < len; ++i) buf[i] *= s;
  return 0;
}

// Assemble a (n_paths, crop_len) batch: load+resample+normalize each file
// and copy crop_len samples from starts[i] (zero-padded past the end),
// fanned out over hardware threads.
int si_batch_crops(const char** paths, int n_paths, int target_sr,
                   float normalize_level, const int64_t* starts,
                   int64_t crop_len, float* out) {
  std::atomic<int> next(0), err(0);
  const int n_threads =
      std::max(1u, std::min<unsigned>(std::thread::hardware_concurrency(),
                                      static_cast<unsigned>(n_paths)));
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n_paths) return;
      std::vector<float> buf;
      int rc = 0;
      load_resampled(paths[i], target_sr, &buf, &rc);
      if (rc != 0) {
        err.store(rc);
        return;
      }
      if (normalize_level > 0.f)
        si_peak_normalize(buf.data(), buf.size(), normalize_level);
      float* dst = out + static_cast<int64_t>(i) * crop_len;
      const int64_t start = starts[i];
      for (int64_t j = 0; j < crop_len; ++j) {
        const int64_t s = start + j;
        dst[j] = (s >= 0 && s < static_cast<int64_t>(buf.size()))
                     ? buf[s]
                     : 0.f;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

}  // extern "C"
