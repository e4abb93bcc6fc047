// voxhost: native host-side runtime for voxtral-tpu.
//
// The TPU compute path is XLA/Pallas; this library is the native analog of
// the reference's host-side C — audio ingest and the incremental mel
// frontend (voxtral_audio.c semantics) plus Tekken token-byte assembly
// (voxtral_tokenizer.c semantics) — built as a shared library with a plain C
// ABI consumed via ctypes (no pybind11 dependency).
//
// Numerics contract: identical recipe to voxtral_tpu/audio/mel.py (Slaney
// filterbank, periodic Hann 400, direct DFT as GEMM in f32, log10 clamp,
// (x+4)/4), so either implementation can back MelContext.
//
// Build: make -C csrc   (produces libvoxhost.so next to this file)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

constexpr int kSampleRate = 16000;
constexpr int kNFft = 400;
constexpr int kWin = 400;
constexpr int kHop = 160;
constexpr int kNFreq = kNFft / 2 + 1;  // 201
constexpr int kNMel = 128;
constexpr float kLogMelMax = 1.5f;
constexpr int kReflectPad = kNFft / 2;  // 200

// ---------------------------------------------------------------------------
// Mel tables (built once, lazily)
// ---------------------------------------------------------------------------

struct MelTables {
  // dft matrices [kNFft][kNFreq] so re = frame @ cos
  std::vector<float> dft_cos, dft_sin;  // kNFft * kNFreq
  std::vector<float> window;            // kWin
  std::vector<float> filters;           // kNFreq * kNMel

  MelTables() {
    dft_cos.resize((size_t)kNFft * kNFreq);
    dft_sin.resize((size_t)kNFft * kNFreq);
    for (int n = 0; n < kNFft; n++) {
      for (int k = 0; k < kNFreq; k++) {
        double angle = 2.0 * M_PI * (double)k * (double)n / (double)kNFft;
        dft_cos[(size_t)n * kNFreq + k] = (float)std::cos(angle);
        dft_sin[(size_t)n * kNFreq + k] = (float)std::sin(angle);
      }
    }
    window.resize(kWin);
    for (int i = 0; i < kWin; i++)
      window[i] = 0.5f * (1.0f - std::cos(2.0f * (float)M_PI * i / kWin));
    build_filters();
  }

  static double hz_to_mel(double f) {
    const double min_log_hz = 1000.0, min_log_mel = 15.0;
    const double logstep = 27.0 / std::log(6.4);
    double mel = 3.0 * f / 200.0;
    if (f >= min_log_hz) mel = min_log_mel + std::log(f / min_log_hz) * logstep;
    return mel;
  }

  static double mel_to_hz(double m) {
    const double min_log_hz = 1000.0, min_log_mel = 15.0;
    const double logstep = std::log(6.4) / 27.0;
    double f = 200.0 * m / 3.0;
    if (m >= min_log_mel) f = min_log_hz * std::exp(logstep * (m - min_log_mel));
    return f;
  }

  void build_filters() {
    // Slaney filterbank, float64 build then cast (matching mel.py)
    std::vector<double> fft_freqs(kNFreq), filt_freqs(kNMel + 2);
    for (int i = 0; i < kNFreq; i++)
      fft_freqs[i] = (double)(kSampleRate / 2) * i / (kNFreq - 1);
    double mel_min = hz_to_mel(0.0), mel_max = hz_to_mel(8000.0);
    for (int i = 0; i < kNMel + 2; i++)
      filt_freqs[i] = mel_to_hz(mel_min + (mel_max - mel_min) * i / (kNMel + 1));
    filters.assign((size_t)kNFreq * kNMel, 0.0f);
    for (int m = 0; m < kNMel; m++) {
      double lo = filt_freqs[m], c = filt_freqs[m + 1], hi = filt_freqs[m + 2];
      double enorm = 2.0 / (hi - lo);
      for (int f = 0; f < kNFreq; f++) {
        double down = (fft_freqs[f] - lo) / (c - lo);
        double up = (hi - fft_freqs[f]) / (hi - c);
        double v = std::min(down, up);
        if (v > 0) filters[(size_t)f * kNMel + m] = (float)(v * enorm);
      }
    }
  }
};

MelTables* tables() {
  static MelTables t;
  return &t;
}

void frames_to_mel(const float* samples, int64_t start, int n_frames,
                   float* out /* [n_frames][kNMel] */) {
  MelTables* t = tables();
  std::vector<float> windowed(kNFft), power(kNFreq);
  std::vector<float> re(kNFreq), im(kNFreq);
  for (int fr = 0; fr < n_frames; fr++) {
    const float* x = samples + start + (int64_t)fr * kHop;
    for (int i = 0; i < kNFft; i++) windowed[i] = x[i] * t->window[i];
    std::memset(re.data(), 0, sizeof(float) * kNFreq);
    std::memset(im.data(), 0, sizeof(float) * kNFreq);
    for (int n = 0; n < kNFft; n++) {
      float w = windowed[n];
      if (w == 0.0f) continue;
      const float* cr = &t->dft_cos[(size_t)n * kNFreq];
      const float* sr = &t->dft_sin[(size_t)n * kNFreq];
      for (int k = 0; k < kNFreq; k++) {
        re[k] += w * cr[k];
        im[k] += w * sr[k];
      }
    }
    for (int k = 0; k < kNFreq; k++) power[k] = re[k] * re[k] + im[k] * im[k];
    float* row = out + (size_t)fr * kNMel;
    for (int m = 0; m < kNMel; m++) row[m] = 0.0f;
    for (int k = 0; k < kNFreq; k++) {
      float p = power[k];
      if (p == 0.0f) continue;
      const float* filt = &t->filters[(size_t)k * kNMel];
      for (int m = 0; m < kNMel; m++) row[m] += p * filt[m];
    }
    for (int m = 0; m < kNMel; m++) {
      float s = row[m] < 1e-10f ? 1e-10f : row[m];
      float v = std::log10(s);
      float mn = kLogMelMax - 8.0f;
      if (v < mn) v = mn;
      row[m] = (v + 4.0f) / 4.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Incremental mel context (vox_mel_ctx semantics, voxtral_audio.c:405-672)
// ---------------------------------------------------------------------------

struct MelCtx {
  std::vector<float> samples;
  int64_t n_samples = 0;
  int64_t sample_offset = 0;
  std::vector<float> mel;  // n_frames * kNMel
  int64_t n_frames = 0;
  int64_t frame_offset = 0;
  int left_pad = 0;
  bool finished = false;

  static constexpr int kCompactMin = 16000;

  explicit MelCtx(int left_pad_samples) {
    left_pad = kReflectPad + left_pad_samples;
    samples.assign((size_t)left_pad + kSampleRate, 0.0f);
    n_samples = left_pad;
  }

  void ensure(int64_t needed) {
    if ((int64_t)samples.size() < needed) {
      int64_t cap = (int64_t)samples.size();
      while (cap < needed) cap *= 2;
      samples.resize((size_t)cap, 0.0f);
    }
  }

  void append(const float* x, int64_t n) {
    ensure(n_samples + n);
    std::memcpy(samples.data() + n_samples, x, sizeof(float) * (size_t)n);
    n_samples += n;
  }

  int64_t compute_available() {
    int64_t t0 = frame_offset + n_frames;
    int64_t start0 = t0 * kHop - sample_offset;
    int64_t n_new = (n_samples - start0 - kNFft) / kHop + 1;
    if (n_new <= 0) return 0;
    mel.resize((size_t)(n_frames + n_new) * kNMel);
    frames_to_mel(samples.data(), start0,
                  (int)n_new, mel.data() + (size_t)n_frames * kNMel);
    n_frames += n_new;
    return n_new;
  }

  void compact_samples() {
    int64_t needed_from = (frame_offset + n_frames) * kHop;
    int64_t discard = std::min(needed_from - sample_offset, n_samples);
    if (discard < kCompactMin) return;
    std::memmove(samples.data(), samples.data() + discard,
                 sizeof(float) * (size_t)(n_samples - discard));
    n_samples -= discard;
    sample_offset += discard;
  }

  int64_t feed(const float* x, int64_t n) {
    if (finished || n <= 0) return 0;
    append(x, n);
    int64_t nn = compute_available();
    compact_samples();
    return nn;
  }

  int64_t finish(int64_t right_pad) {
    if (finished) return n_frames;
    if (right_pad > 0) {
      ensure(n_samples + right_pad);
      std::memset(samples.data() + n_samples, 0,
                  sizeof(float) * (size_t)right_pad);
      n_samples += right_pad;
    }
    int64_t real_end = n_samples - right_pad;
    std::vector<float> reflect(kReflectPad, 0.0f);
    for (int i = 0; i < kReflectPad; i++) {
      int64_t src = real_end - 2 - i;
      if (src >= 0) reflect[i] = samples[(size_t)src];
    }
    append(reflect.data(), kReflectPad);
    compute_available();
    if (n_frames > 0) n_frames--;
    finished = true;
    return n_frames;
  }

  void discard_before(int64_t keep_from) {
    int64_t discard = std::min(std::max<int64_t>(keep_from - frame_offset, 0),
                               n_frames);
    if (discard <= 0) return;
    std::memmove(mel.data(), mel.data() + (size_t)discard * kNMel,
                 sizeof(float) * (size_t)(n_frames - discard) * kNMel);
    n_frames -= discard;
    mel.resize((size_t)n_frames * kNMel);
    frame_offset += discard;
    compact_samples();
  }
};

}  // namespace

extern "C" {

// -- mel context -----------------------------------------------------------
void* vox_mel_ctx_new(int left_pad_samples) {
  return new MelCtx(left_pad_samples);
}
void vox_mel_ctx_free(void* ctx) { delete (MelCtx*)ctx; }
int64_t vox_mel_feed(void* ctx, const float* x, int64_t n) {
  return ((MelCtx*)ctx)->feed(x, n);
}
int64_t vox_mel_finish(void* ctx, int64_t right_pad) {
  return ((MelCtx*)ctx)->finish(right_pad);
}
int64_t vox_mel_n_frames(void* ctx) { return ((MelCtx*)ctx)->n_frames; }
int64_t vox_mel_frame_offset(void* ctx) { return ((MelCtx*)ctx)->frame_offset; }
// copies [n_frames, 128] into out
void vox_mel_copy(void* ctx, float* out) {
  MelCtx* c = (MelCtx*)ctx;
  std::memcpy(out, c->mel.data(), sizeof(float) * (size_t)c->n_frames * kNMel);
}
void vox_mel_discard_before(void* ctx, int64_t keep_from) {
  ((MelCtx*)ctx)->discard_before(keep_from);
}

// -- batch mel -------------------------------------------------------------
// out must hold frames*128 floats; returns frame count (reflect-padded,
// drop-last-frame). Returns -1 if out_cap too small.
int64_t vox_mel_batch(const float* x, int64_t n, float* out, int64_t out_cap) {
  int64_t padded_len = n + 2 * kReflectPad;
  int64_t frames = (padded_len - kNFft) / kHop + 1 - 1;
  if (frames <= 0) return 0;
  if (frames * kNMel > out_cap) return -1;
  std::vector<float> padded((size_t)padded_len);
  for (int i = 0; i < kReflectPad; i++) {
    int64_t src = kReflectPad - i;
    padded[i] = (src < n) ? x[src] : 0.0f;
  }
  std::memcpy(padded.data() + kReflectPad, x, sizeof(float) * (size_t)n);
  for (int i = 0; i < kReflectPad; i++) {
    int64_t src = n - 2 - i;
    padded[(size_t)(kReflectPad + n + i)] = (src >= 0) ? x[src] : 0.0f;
  }
  frames_to_mel(padded.data(), 0, (int)frames, out);
  return frames;
}

// -- PCM conversion --------------------------------------------------------
void vox_s16_to_f32(const int16_t* in, float* out, int64_t n) {
  for (int64_t i = 0; i < n; i++) out[i] = in[i] / 32768.0f;
}

// Linear resample; returns output length (caller sizes out as n*dst/src).
int64_t vox_resample_linear(const float* in, int64_t n, int src_rate,
                            int dst_rate, float* out) {
  if (src_rate == dst_rate) {
    std::memcpy(out, in, sizeof(float) * (size_t)n);
    return n;
  }
  int64_t new_n = n * dst_rate / src_rate;
  for (int64_t i = 0; i < new_n; i++) {
    double src_pos = (double)i * src_rate / dst_rate;
    int64_t idx = (int64_t)src_pos;
    float frac = (float)(src_pos - idx);
    int64_t nxt = idx + 1 < n ? idx + 1 : n - 1;
    out[i] = in[idx] * (1.0f - frac) + in[nxt] * frac;
  }
  return new_n;
}

// -- version ---------------------------------------------------------------
int vox_host_abi_version() { return 1; }

}  // extern "C"
