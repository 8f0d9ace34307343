// genie_audio — native host-side audio runtime for genie-tts-tpu.
//
// Roles covered (native deps of the reference, SURVEY.md §2.3):
//   * soxr        -> ga_resample: windowed-sinc polyphase rational resampler
//   * numpy glue  -> ga_float_to_pcm16 / ga_pcm16_to_float: streaming PCM
//                    conversion (reference: Core/TTSPlayer.py:51-53)
//   * mixing      -> ga_mix_to_mono
//
// Built as a shared library, loaded via ctypes (genie_tts_tpu/utils/native.py).
// No external dependencies; C ABI.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// Kaiser window via the zeroth-order modified Bessel function.
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

int gcd_int(int a, int b) { return b == 0 ? a : gcd_int(b, a % b); }

}  // namespace

extern "C" {

// Required output capacity for ga_resample.
int64_t ga_resample_out_len(int64_t n_in, int sr_in, int sr_out) {
  const int g = gcd_int(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  return (n_in * up + down - 1) / down;
}

// Polyphase windowed-sinc resampling (Kaiser beta 12.0, 32 taps/phase).
// Returns the number of output samples written, or -1 on error.
int64_t ga_resample(const float* in, int64_t n_in, int sr_in, int sr_out,
                    float* out, int64_t max_out) {
  if (sr_in <= 0 || sr_out <= 0 || n_in < 0) return -1;
  if (sr_in == sr_out) {
    if (max_out < n_in) return -1;
    std::memcpy(out, in, sizeof(float) * n_in);
    return n_in;
  }
  const int g = gcd_int(sr_in, sr_out);
  const int up = sr_out / g, down = sr_in / g;
  const int64_t n_out = ga_resample_out_len(n_in, sr_in, sr_out);
  if (max_out < n_out) return -1;

  // anti-alias cutoff at min(sr_in, sr_out)/2
  const double cutoff = 0.5 / std::max(up, down);
  const int taps_per_phase = 32;
  const int half = taps_per_phase / 2;
  const double beta = 12.0;
  const double i0b = bessel_i0(beta);

  // filter h[k] over k in [-half*up, half*up): windowed sinc at rate up*sr_in
  const int64_t filt_len = static_cast<int64_t>(2) * half * up;
  std::vector<double> h(filt_len);
  for (int64_t k = 0; k < filt_len; ++k) {
    const double t = (static_cast<double>(k) - half * up + 0.5) / up;
    const double x = 2.0 * cutoff * t;
    const double sinc = (std::abs(x) < 1e-12) ? 1.0 : std::sin(kPi * x) / (kPi * x);
    const double w_arg = (static_cast<double>(k) + 0.5) / filt_len;
    const double win =
        bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - (2.0 * w_arg - 1.0) * (2.0 * w_arg - 1.0)))) / i0b;
    h[k] = 2.0 * cutoff * sinc * win * up;
  }

  for (int64_t m = 0; m < n_out; ++m) {
    // output sample m corresponds to input time m*down/up
    const int64_t num = m * down;
    const int64_t n0 = num / up;           // base input index
    const int64_t phase = num % up;        // fractional phase in [0, up)
    double acc = 0.0;
    // h index for input sample n0 - j (j in [-half, half))
    for (int j = -half + 1; j <= half; ++j) {
      const int64_t n_idx = n0 + j;
      if (n_idx < 0 || n_idx >= n_in) continue;
      const int64_t k = (static_cast<int64_t>(j + half) - 1) * up + (up - 1 - phase);
      if (k < 0 || k >= filt_len) continue;
      acc += h[k] * in[n_idx];
    }
    out[m] = static_cast<float>(acc);
  }
  return n_out;
}

void ga_float_to_pcm16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    out[i] = static_cast<int16_t>(v * 32767.0f);
  }
}

void ga_pcm16_to_float(const int16_t* in, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
}

// interleaved [n_frames, channels] -> mono mean
void ga_mix_to_mono(const float* in, int64_t n_frames, int channels, float* out) {
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) acc += in[i * channels + c];
    out[i] = static_cast<float>(acc / channels);
  }
}

}  // extern "C"
