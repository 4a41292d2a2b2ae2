// Multithreaded RF streaming daemon: the production host-side pipeline that
// feeds a TPU serving process.
//
// Counterpart of the reference's largest native example, the 1.7k-LoC Rust
// ONNXRuntime pipeline (examples/YOLOv8-ONNXRuntime-Rust/src/model.rs:15) —
// redesigned for the TPU deployment split: the host owns capture, framing,
// spectrogram rendering and batching; the accelerator process consumes
// ready-made uint8 tiles (1 channel — see bench.py's 1ch-upload rationale).
//
// Architecture:
//   [N capture threads] --IQ chunks--> [bounded ring buffer, backpressure]
//        --> [render thread: Hann frame + radix-2 DFT + log-power + letterbox]
//        --> [batcher: fixed-size uint8 tile batches + stats]
//
// `--selftest` runs a bounded synthetic workload and checks invariants
// (all produced chunks consumed, tiles finite/nonzero, batch accounting).
//
// Build: ./build.sh    Run: ./stream_daemon --selftest

#include <atomic>
#include <cmath>
#include <complex>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kNFft = 256;
constexpr int kHop = 128;
constexpr int kTileT = 256;   // time frames per tile
constexpr int kImg = 640;     // letterboxed output
constexpr int kBatch = 8;

struct IQChunk {
  int source = 0;
  int64_t seq = 0;
  std::vector<std::complex<float>> iq;  // kNFft + kHop*(kTileT-1) samples
};

// Bounded MPSC ring with blocking push (backpressure) and pop.
class ChunkRing {
 public:
  explicit ChunkRing(size_t cap) : cap_(cap) {}

  void push(IQChunk&& c) {
    std::unique_lock<std::mutex> lk(m_);
    not_full_.wait(lk, [&] { return q_.size() < cap_ || closed_; });
    if (closed_) return;
    q_.push(std::move(c));
    if (q_.size() == cap_) ++backpressure_events_;
    not_empty_.notify_one();
  }

  bool pop(IQChunk* out) {
    std::unique_lock<std::mutex> lk(m_);
    not_empty_.wait(lk, [&] { return !q_.empty() || closed_; });
    if (q_.empty()) return false;
    *out = std::move(q_.front());
    q_.pop();
    not_full_.notify_all();
    return true;
  }

  void close() {
    std::lock_guard<std::mutex> lk(m_);
    closed_ = true;
    not_empty_.notify_all();
    not_full_.notify_all();
  }

  int64_t backpressure_events() const { return backpressure_events_; }

 private:
  size_t cap_;
  std::queue<IQChunk> q_;
  std::mutex m_;
  std::condition_variable not_empty_, not_full_;
  bool closed_ = false;
  int64_t backpressure_events_ = 0;
};

// In-place radix-2 DIT FFT (power-of-two n).
void fft(std::vector<std::complex<float>>& a) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const float ang = -2.0f * float(M_PI) / float(len);
    const std::complex<float> wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<float> w(1.0f, 0.0f);
      for (size_t k = 0; k < len / 2; ++k) {
        const auto u = a[i + k], v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
}

// One IQ chunk -> (kNFft x kTileT) log-power spectrogram, fftshifted rows,
// normalized to uint8 — the same rendering data/synth.py and ops/stft.py use.
std::vector<uint8_t> render_tile(const IQChunk& c) {
  static thread_local std::vector<float> hann;
  if (hann.empty()) {
    hann.resize(kNFft);
    for (int i = 0; i < kNFft; ++i)
      hann[i] = 0.5f - 0.5f * std::cos(2.0f * float(M_PI) * i / (kNFft - 1));
  }
  std::vector<float> power(kNFft * kTileT);
  std::vector<std::complex<float>> buf(kNFft);
  float pmin = 1e30f, pmax = -1e30f;
  for (int t = 0; t < kTileT; ++t) {
    const auto* seg = c.iq.data() + (size_t)t * kHop;
    for (int i = 0; i < kNFft; ++i) buf[i] = seg[i] * hann[i];
    fft(buf);
    for (int f = 0; f < kNFft; ++f) {
      const int fs = (f + kNFft / 2) % kNFft;  // fftshift
      const float p = std::log10(std::norm(buf[fs]) + 1e-12f);
      power[(size_t)f * kTileT + t] = p;
      pmin = std::min(pmin, p);
      pmax = std::max(pmax, p);
    }
  }
  const float scale = 255.0f / std::max(pmax - pmin, 1e-6f);
  std::vector<uint8_t> img(kNFft * kTileT);
  for (size_t i = 0; i < power.size(); ++i)
    img[i] = (uint8_t)std::lround((power[i] - pmin) * scale);
  return img;
}

// Aspect-preserving letterbox of a (h x w) gray tile into (kImg x kImg),
// pad value 114 — matching utils/native.py letterbox semantics.
void letterbox_gray(const std::vector<uint8_t>& src, int h, int w, uint8_t* dst) {
  const float r = std::min(float(kImg) / h, float(kImg) / w);
  const int nh = int(std::lround(h * r)), nw = int(std::lround(w * r));
  const int top = (kImg - nh) / 2, left = (kImg - nw) / 2;
  std::memset(dst, 114, (size_t)kImg * kImg);
  for (int y = 0; y < nh; ++y) {
    const float sy = std::min((y + 0.5f) / r - 0.5f, float(h - 1));
    const int y0 = std::max(0, (int)sy), y1 = std::min(h - 1, y0 + 1);
    const float fy = sy - y0;
    for (int x = 0; x < nw; ++x) {
      const float sx = std::min((x + 0.5f) / r - 0.5f, float(w - 1));
      const int x0 = std::max(0, (int)sx), x1 = std::min(w - 1, x0 + 1);
      const float fx = sx - x0;
      const float v = (1 - fy) * ((1 - fx) * src[(size_t)y0 * w + x0] + fx * src[(size_t)y0 * w + x1]) +
                      fy * ((1 - fx) * src[(size_t)y1 * w + x0] + fx * src[(size_t)y1 * w + x1]);
      dst[(size_t)(top + y) * kImg + (left + x)] = (uint8_t)std::lround(v);
    }
  }
}

struct Stats {
  std::atomic<int64_t> chunks_produced{0}, tiles_rendered{0}, batches_emitted{0};
  std::atomic<int64_t> nonzero_px{0};
};

// Capture thread: synthesizes IQ with LTE-like wideband + narrowband bursts
// (file/SDR intake would replace this in deployment; the ring contract and
// downstream stay identical).
void capture(int source, int n_chunks, ChunkRing* ring, Stats* stats) {
  std::mt19937 rng(1234u + source);
  std::normal_distribution<float> noise(0.0f, 0.05f);
  std::uniform_real_distribution<float> uni(0.0f, 1.0f);
  const size_t n_samples = kNFft + (size_t)kHop * (kTileT - 1);
  for (int k = 0; k < n_chunks; ++k) {
    IQChunk c;
    c.source = source;
    c.seq = k;
    c.iq.resize(n_samples);
    for (auto& s : c.iq) s = {noise(rng), noise(rng)};
    const int bursts = 1 + int(uni(rng) * 3);
    for (int b = 0; b < bursts; ++b) {
      const float fc = (uni(rng) - 0.5f) * 0.84f;
      const float amp = 1.5f + 3.0f * uni(rng);
      const size_t i0 = size_t(uni(rng) * 0.7f * n_samples);
      const size_t i1 = std::min(n_samples, i0 + size_t((0.05f + 0.25f * uni(rng)) * n_samples));
      for (size_t i = i0; i < i1; ++i) {
        const float ph = 2.0f * float(M_PI) * fc * float(i);
        c.iq[i] += std::complex<float>(amp * std::cos(ph), amp * std::sin(ph));
      }
    }
    stats->chunks_produced.fetch_add(1);
    ring->push(std::move(c));
  }
}

}  // namespace

int main(int argc, char** argv) {
  const bool selftest = argc > 1 && std::string(argv[1]) == "--selftest";
  const int n_sources = 4;
  const int chunks_per_source = selftest ? 8 : 1 << 20;

  ChunkRing ring(/*cap=*/6);  // small on purpose: exercises backpressure
  Stats stats;

  std::vector<std::thread> captures;
  captures.reserve(n_sources);
  for (int s = 0; s < n_sources; ++s)
    captures.emplace_back(capture, s, chunks_per_source, &ring, &stats);

  // Render + batch on the consumer side.
  std::vector<uint8_t> batch((size_t)kBatch * kImg * kImg);
  int in_batch = 0;
  std::thread renderer([&] {
    IQChunk c;
    while (ring.pop(&c)) {
      const auto tile = render_tile(c);
      letterbox_gray(tile, kNFft, kTileT, batch.data() + (size_t)in_batch * kImg * kImg);
      stats.tiles_rendered.fetch_add(1);
      if (++in_batch == kBatch) {
        in_batch = 0;
        int64_t nz = 0;
        for (size_t i = 0; i < batch.size(); ++i) nz += batch[i] != 114;
        stats.nonzero_px.fetch_add(nz);
        stats.batches_emitted.fetch_add(1);
        // deployment: hand `batch` to the TPU process here (shared memory /
        // unix socket); the self-test only accounts for it
      }
    }
  });

  for (auto& t : captures) t.join();
  ring.close();
  renderer.join();

  const int64_t produced = stats.chunks_produced.load();
  const int64_t rendered = stats.tiles_rendered.load();
  const int64_t batches = stats.batches_emitted.load();
  std::printf("produced=%lld rendered=%lld batches=%lld backpressure=%lld nonzero_px/batch=%.0f\n",
              (long long)produced, (long long)rendered, (long long)batches,
              (long long)ring.backpressure_events(),
              batches ? double(stats.nonzero_px.load()) / batches : 0.0);

  if (selftest) {
    const bool ok = produced == int64_t(n_sources) * chunks_per_source &&
                    rendered == produced && batches == produced / kBatch &&
                    stats.nonzero_px.load() > 0;
    std::printf("selftest: %s\n", ok ? "PASS" : "FAIL");
    return ok ? 0 : 1;
  }
  return 0;
}
