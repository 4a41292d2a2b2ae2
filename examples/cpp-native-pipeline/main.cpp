// Standalone native pipeline demo (counterpart of the reference's C++
// inference examples, e.g. examples/YOLOv8-CPP-Inference): exercises the
// framework's native preprocessing core end to end from C++ —
//   raw RGB frame -> letterbox into a batch buffer -> (device inference
//   happens out-of-process via the exported StableHLO; this demo feeds the
//   dumped raw predictions) -> greedy NMS -> detections.
//
// Build:  sh build.sh        (links ../../native/preprocess.cpp directly)
// Run:    ./pipeline_demo    (self-contained: synthesizes a frame + preds)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <random>

extern "C" {
void letterbox_into_batch(const uint8_t*, int, int, uint8_t*, int, int, float*);
void fill_u8(uint8_t*, int64_t, uint8_t);
int greedy_nms(const float*, const float*, int, float, float, uint8_t*);
}

int main() {
  const int imgsz = 640, h = 720, w = 1280;
  std::vector<uint8_t> frame(h * w * 3);
  std::mt19937 rng(0);
  for (auto& v : frame) v = rng() & 0xFF;

  std::vector<uint8_t> batch(imgsz * imgsz * 3);
  float geom[3];
  fill_u8(batch.data(), (int64_t)batch.size(), 114);
  letterbox_into_batch(frame.data(), h, w, batch.data(), 0, imgsz, geom);
  std::printf("letterbox: ratio=%.4f pad=(%.1f, %.1f)\n", geom[0], geom[1], geom[2]);

  // synthesize score-desc sorted candidate boxes (stand-in for the decoded
  // model output; in deployment these come from the compiled StableHLO)
  const int n = 64;
  std::vector<float> boxes(n * 4), scores(n);
  for (int i = 0; i < n; ++i) {
    float cx = 100 + (i % 8) * 60, cy = 100 + (i / 8) * 60;
    boxes[i * 4] = cx - 30 + (i % 3) * 5;
    boxes[i * 4 + 1] = cy - 30;
    boxes[i * 4 + 2] = cx + 30;
    boxes[i * 4 + 3] = cy + 30;
    scores[i] = 0.95f - 0.01f * i;
  }
  std::vector<uint8_t> keep(n);
  int kept = greedy_nms(boxes.data(), scores.data(), n, 0.45f, 0.25f, keep.data());
  std::printf("nms: kept %d / %d candidates\n", kept, n);
  for (int i = 0; i < n && i < 8; ++i)
    if (keep[i])
      std::printf("  box [%.0f %.0f %.0f %.0f] score %.2f\n",
                  boxes[i * 4], boxes[i * 4 + 1], boxes[i * 4 + 2], boxes[i * 4 + 3], scores[i]);
  return kept > 0 ? 0 : 1;
}
