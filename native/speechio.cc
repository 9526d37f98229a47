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

// ---------------------------------------------------------------- FLAC
// From-scratch FLAC decoder (the VCTK corpus ships 48 kHz mic flacs,
// I_ea/dataset/preprocessing.py:379-390; libsndfile/librosa are absent by
// design). Subset of the format spec sufficient for any native FLAC file:
// STREAMINFO metadata, frames with constant/verbatim/fixed/LPC subframes,
// 4- and 5-bit Rice residuals with escapes, wasted bits, and all four
// channel assignments (independent, left/side, right/side, mid/side).
// CRCs are not verified (decode integrity is covered by tests).

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : d_(data), n_(size) {}

  // n in [0, 64]: 64-bit accumulation so 33-bit reads (a 32-bps stream's
  // side channel, or 32-bit verbatim/warmup samples) keep their top bit.
  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      const size_t byte = pos_ >> 3;
      if (byte >= n_) {
        ok_ = false;
        return 0;
      }
      v = (v << 1) | ((d_[byte] >> (7 - (pos_ & 7))) & 1u);
      ++pos_;
    }
    return v;
  }

  int64_t sbits(int n) {  // sign-extended
    if (n == 0) return 0;
    uint64_t v = bits(n);
    const uint64_t sign = 1ull << (n - 1);
    return static_cast<int64_t>((v ^ sign)) - static_cast<int64_t>(sign);
  }

  uint32_t unary() {  // count 0s until the terminating 1
    uint32_t q = 0;
    while (ok_ && bits(1) == 0) ++q;
    return q;
  }

  uint64_t utf8() {  // FLAC extended UTF-8 coded number (frame header)
    uint32_t b0 = static_cast<uint32_t>(bits(8));
    int extra = 0;
    uint64_t v = 0;
    if ((b0 & 0x80u) == 0) return b0;
    for (uint32_t m = 0x40u; b0 & m; m >>= 1) ++extra;
    if (extra < 1 || extra > 6) {  // 0x80-0xBF / 0xFF: invalid lead byte
      ok_ = false;                 // (extra==7 would shift by -1 — UB)
      return 0;
    }
    v = b0 & ((1u << (6 - extra)) - 1);
    for (int i = 0; i < extra; ++i) v = (v << 6) | (bits(8) & 0x3Fu);
    return v;
  }

  void align() { pos_ = (pos_ + 7) & ~size_t(7); }
  bool ok() const { return ok_; }
  bool at_end() const { return (pos_ >> 3) >= n_; }

 private:
  const uint8_t* d_;
  size_t n_;
  size_t pos_ = 0;
  bool ok_ = true;
};

bool flac_residual(BitReader* br, int pred_order, int block_size,
                   std::vector<int64_t>* x) {
  const uint32_t method = br->bits(2);
  if (method > 1) return false;
  const int pbits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xFu : 0x1Fu;
  const uint32_t porder = br->bits(4);
  const int partitions = 1 << porder;
  if ((block_size >> porder) << porder != block_size) return false;
  int idx = pred_order;
  for (int p = 0; p < partitions; ++p) {
    int count = block_size >> porder;
    if (p == 0) count -= pred_order;
    if (count < 0) return false;
    const uint32_t param = br->bits(pbits);
    if (param == escape) {
      const int raw = static_cast<int>(br->bits(5));
      for (int i = 0; i < count; ++i) (*x)[idx++] = br->sbits(raw);
    } else {
      for (int i = 0; i < count; ++i) {
        const uint64_t q = br->unary();
        const uint64_t r = br->bits(static_cast<int>(param));
        const uint64_t v = (q << param) | r;
        (*x)[idx++] = static_cast<int64_t>(v >> 1) ^
                      -static_cast<int64_t>(v & 1);  // zigzag
      }
    }
    if (!br->ok()) return false;
  }
  return true;
}

bool flac_subframe(BitReader* br, int block_size, int bps,
                   std::vector<int64_t>* x) {
  if (br->bits(1) != 0) return false;  // mandatory zero pad bit
  const uint32_t type = br->bits(6);
  int wasted = 0;
  if (br->bits(1) == 1) wasted = 1 + static_cast<int>(br->unary());
  bps -= wasted;
  x->assign(block_size, 0);
  if (type == 0) {  // CONSTANT
    const int64_t v = br->sbits(bps);
    for (auto& s : *x) s = v;
  } else if (type == 1) {  // VERBATIM
    for (auto& s : *x) s = br->sbits(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    const int order = static_cast<int>(type) - 8;
    for (int i = 0; i < order; ++i) (*x)[i] = br->sbits(bps);
    if (!flac_residual(br, order, block_size, x)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t p = 0;
      switch (order) {  // fixed linear predictors
        case 0: p = 0; break;
        case 1: p = (*x)[i - 1]; break;
        case 2: p = 2 * (*x)[i - 1] - (*x)[i - 2]; break;
        case 3:
          p = 3 * (*x)[i - 1] - 3 * (*x)[i - 2] + (*x)[i - 3];
          break;
        default:
          p = 4 * (*x)[i - 1] - 6 * (*x)[i - 2] + 4 * (*x)[i - 3] -
              (*x)[i - 4];
      }
      (*x)[i] += p;
    }
  } else if (type >= 32) {  // LPC, order = type - 31
    const int order = static_cast<int>(type) - 31;
    for (int i = 0; i < order; ++i) (*x)[i] = br->sbits(bps);
    const uint32_t prec_m1 = br->bits(4);
    if (prec_m1 == 0xF) return false;
    const int precision = static_cast<int>(prec_m1) + 1;
    const int shift = static_cast<int>(br->sbits(5));
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br->sbits(precision);
    if (!flac_residual(br, order, block_size, x)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * (*x)[i - 1 - j];
      (*x)[i] += acc >> shift;
    }
  } else {
    return false;  // reserved type
  }
  if (wasted > 0)
    for (auto& s : *x) s <<= wasted;
  return br->ok();
}

int decode_flac(const char* path, std::vector<float>* out, int* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  fseek(f, 0, SEEK_END);
  const long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  const size_t got = fread(data.data(), 1, data.size(), f);
  fclose(f);
  if (got < 42 || memcmp(data.data(), "fLaC", 4) != 0) return kErrFormat;

  // metadata blocks; STREAMINFO is always first
  size_t pos = 4;
  uint32_t sample_rate = 0;
  int channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  bool have_info = false;
  while (!last && pos + 4 <= data.size()) {
    last = (data[pos] & 0x80u) != 0;
    const int btype = data[pos] & 0x7F;
    const uint32_t blen = (uint32_t(data[pos + 1]) << 16) |
                          (uint32_t(data[pos + 2]) << 8) | data[pos + 3];
    pos += 4;
    if (btype == 0 && blen >= 34 && pos + blen <= data.size()) {
      BitReader br(data.data() + pos, blen);
      br.bits(16);  // min block size
      br.bits(16);  // max block size
      br.bits(24);  // min frame size
      br.bits(24);  // max frame size
      sample_rate = br.bits(20);
      channels = static_cast<int>(br.bits(3)) + 1;
      bps = static_cast<int>(br.bits(5)) + 1;
      // sequence the two reads: operands of '|' are unsequenced in C++,
      // so a right-to-left compiler would consume the 32-bit field first
      {
        const uint64_t ts_hi = br.bits(4);
        total_samples = (ts_hi << 32) | br.bits(32);
      }
      have_info = true;
    }
    pos += blen;
  }
  if (!have_info || sample_rate == 0 || channels < 1 || channels > 8)
    return kErrFormat;

  out->clear();
  if (total_samples) out->reserve(static_cast<size_t>(total_samples));
  BitReader br(data.data() + pos, data.size() - pos);
  std::vector<std::vector<int64_t>> ch(channels);
  const float scale = 1.0f / (1ll << (bps - 1));
  while (!br.at_end() &&
         (total_samples == 0 || out->size() < total_samples)) {
    if (br.bits(14) != 0x3FFE) break;  // frame sync (or trailing garbage)
    br.bits(1);                        // reserved
    br.bits(1);                        // blocking strategy
    const uint32_t bs_code = br.bits(4);
    const uint32_t sr_code = br.bits(4);
    const uint32_t ch_code = br.bits(4);
    const uint32_t ss_code = br.bits(3);
    br.bits(1);  // reserved
    br.utf8();   // frame/sample number
    int block_size = 0;
    switch (bs_code) {
      case 1: block_size = 192; break;
      case 2: case 3: case 4: case 5:
        block_size = 576 << (bs_code - 2); break;
      case 6: block_size = static_cast<int>(br.bits(8)) + 1; break;
      case 7: block_size = static_cast<int>(br.bits(16)) + 1; break;
      default:
        if (bs_code >= 8)
          block_size = 256 << (bs_code - 8);
        else
          return kErrFormat;  // 0 reserved
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int fbps = bps;
    switch (ss_code) {
      case 0: fbps = bps; break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      case 7: fbps = 32; break;
      default: return kErrFormat;
    }
    br.bits(8);  // header CRC-8
    int n_ch = channels;
    if (ch_code <= 7) n_ch = static_cast<int>(ch_code) + 1;
    else if (ch_code <= 10) n_ch = 2;
    else return kErrFormat;
    if (n_ch != channels) return kErrFormat;
    for (int c = 0; c < n_ch; ++c) {
      // the difference (side) channel carries one extra bit
      const bool side = (ch_code == 8 && c == 1) ||
                        (ch_code == 9 && c == 0) ||
                        (ch_code == 10 && c == 1);
      if (!flac_subframe(&br, block_size, fbps + (side ? 1 : 0), &ch[c]))
        return kErrFormat;
    }
    br.align();
    br.bits(16);  // frame CRC-16
    if (!br.ok()) return kErrFormat;
    // stereo decorrelation (libFLAC reconstruction formulas)
    if (ch_code == 8) {       // left/side: right = left - side
      for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_code == 9) {  // right/side: left = right + side
      for (int i = 0; i < block_size; ++i) ch[0][i] += ch[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        const int64_t side_v = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side_v & 1);
        ch[0][i] = (mid + side_v) >> 1;
        ch[1][i] = (mid - side_v) >> 1;
      }
    }
    int take = block_size;
    if (total_samples &&
        out->size() + static_cast<size_t>(take) > total_samples)
      take = static_cast<int>(total_samples - out->size());
    for (int i = 0; i < take; ++i) {  // downmix to mono (decode_wav policy)
      double acc = 0.0;
      for (int c = 0; c < channels; ++c)
        acc += static_cast<double>(ch[c][i]);
      out->push_back(static_cast<float>(acc / channels * scale));
    }
  }
  if (total_samples != 0 && out->size() != total_samples) return kErrFormat;
  *sr_out = static_cast<int>(sample_rate);
  return 0;
}

bool has_suffix(const char* path, const char* suffix) {
  const size_t lp = strlen(path), ls = strlen(suffix);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; ++i) {
    char a = path[lp - ls + i], b = suffix[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

void load_resampled(const char* path, int target_sr, std::vector<float>* out,
                    int* rc_out) {
  std::vector<float> pcm;
  int sr = 0;
  int rc = has_suffix(path, ".flac") ? decode_flac(path, &pcm, &sr)
                                     : decode_wav(path, &pcm, &sr);
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

int si_flac_info(const char* path, int* sr, int64_t* frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  uint8_t head[4 + 4 + 34];
  const size_t got = fread(head, 1, sizeof(head), f);
  fclose(f);
  if (got < sizeof(head) || memcmp(head, "fLaC", 4) != 0 ||
      (head[4] & 0x7F) != 0)  // STREAMINFO must be the first block
    return kErrFormat;
  BitReader br(head + 8, 34);
  br.bits(16); br.bits(16); br.bits(24); br.bits(24);
  *sr = static_cast<int>(br.bits(20));
  br.bits(3);  // channels - 1
  br.bits(5);  // bps - 1
  {
    const uint64_t fr_hi = br.bits(4);  // sequenced: '|' operands are not
    *frames = static_cast<int64_t>((fr_hi << 32) | br.bits(32));
  }
  return *sr > 0 ? 0 : kErrFormat;
}

// Works for .wav and .flac paths alike (suffix dispatch in load_resampled).
int si_load_wav(const char* path, int target_sr, float* out,
                int64_t capacity, int64_t* out_len) {
  std::vector<float> buf;
  int rc = 0;
  load_resampled(path, target_sr, &buf, &rc);
  if (rc != 0) return rc;
  if (static_cast<int64_t>(buf.size()) > capacity) {
    // report the required length so the caller can reallocate exactly
    // (capacity estimates from file size can undershoot for highly
    // compressible FLAC streams whose STREAMINFO omits total samples)
    *out_len = static_cast<int64_t>(buf.size());
    return kErrCapacity;
  }
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
