// Native preprocessing core for spectrogram_yolov11_tpu.
//
// TPU-native counterpart of the reference's native layer: where the reference
// ships C++ inference example pipelines (examples/YOLOv8-CPP-Inference
// inference.cpp letterbox + NMS), this library implements the host-side hot
// path of OUR data loader/predictor — aspect-preserving bilinear letterbox
// resize of uint8 HWC frames straight into a preallocated batch buffer, and
// greedy NMS for native consumers. Exposed via C ABI for ctypes
// (spectrogram_yolov11_tpu/utils/native.py); single-threaded by design (the
// deployment host has one core — copies, not parallelism, are the enemy).
//
// Build: native/build.sh  ->  native/libsytnative.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// Bilinear resize of src (h_src, w_src, 3) uint8 HWC into dst (h_dst, w_dst, 3).
// Fixed-point (16.16) arithmetic, half-pixel centers (matches cv2 INTER_LINEAR).
void resize_bilinear_u8(const uint8_t* src, int h_src, int w_src,
                        uint8_t* dst, int h_dst, int w_dst, int dst_stride_bytes) {
  const int64_t FP = 1 << 16;
  const int64_t sx = (int64_t)((double)w_src / w_dst * FP);
  const int64_t sy = (int64_t)((double)h_src / h_dst * FP);

  std::vector<int> x0v(w_dst), x1v(w_dst);
  std::vector<int32_t> fxv(w_dst);
  for (int x = 0; x < w_dst; ++x) {
    int64_t fx = (x * 2 + 1) * sx / 2 - FP / 2;  // half-pixel centers
    if (fx < 0) fx = 0;
    int xi = (int)(fx >> 16);
    x0v[x] = std::min(xi, w_src - 1);
    x1v[x] = std::min(xi + 1, w_src - 1);
    fxv[x] = (int32_t)(fx & 0xFFFF);
  }
  for (int y = 0; y < h_dst; ++y) {
    int64_t fy = (y * 2 + 1) * sy / 2 - FP / 2;
    if (fy < 0) fy = 0;
    int yi = (int)(fy >> 16);
    int y0 = std::min(yi, h_src - 1);
    int y1 = std::min(yi + 1, h_src - 1);
    int32_t wy = (int32_t)(fy & 0xFFFF);
    const uint8_t* r0 = src + (size_t)y0 * w_src * 3;
    const uint8_t* r1 = src + (size_t)y1 * w_src * 3;
    uint8_t* out = dst + (size_t)y * dst_stride_bytes;
    for (int x = 0; x < w_dst; ++x) {
      const int x0 = x0v[x] * 3, x1 = x1v[x] * 3;
      const int32_t wx = fxv[x];
      for (int c = 0; c < 3; ++c) {
        int32_t top = r0[x0 + c] * (65536 - wx) + r0[x1 + c] * wx;       // 8.16
        int32_t bot = r1[x0 + c] * (65536 - wx) + r1[x1 + c] * wx;
        int32_t v = (int32_t)(((int64_t)top * (65536 - wy) + (int64_t)bot * wy) >> 32);
        out[x * 3 + c] = (uint8_t)v;
      }
    }
  }
}

// Letterbox one frame into slot `index` of a batch buffer
// (batch, imgsz, imgsz, 3) that is pre-filled with pad_value.
// Returns the scale ratio via out_geom = {ratio, dw, dh}.
void letterbox_into_batch(const uint8_t* src, int h_src, int w_src,
                          uint8_t* batch, int index, int imgsz,
                          float* out_geom) {
  double r = std::min((double)imgsz / h_src, (double)imgsz / w_src);
  int nw = (int)std::lround(w_src * r);
  int nh = (int)std::lround(h_src * r);
  double dw = (imgsz - nw) / 2.0, dh = (imgsz - nh) / 2.0;
  int left = (int)std::lround(dw - 0.1);
  int top = (int)std::lround(dh - 0.1);
  uint8_t* slot = batch + (size_t)index * imgsz * imgsz * 3;
  uint8_t* origin = slot + ((size_t)top * imgsz + left) * 3;
  resize_bilinear_u8(src, h_src, w_src, origin, nh, nw, imgsz * 3);
  out_geom[0] = (float)r;
  out_geom[1] = (float)dw;
  out_geom[2] = (float)dh;
}

// Fill a batch buffer with the letterbox pad value.
void fill_u8(uint8_t* buf, int64_t n, uint8_t value) { std::memset(buf, value, (size_t)n); }

// Greedy class-offset NMS over detections sorted by score desc.
// boxes: (n, 4) xyxy float32 (already class-offset if class-aware),
// keep_out: (n,) uint8 mask. Returns number kept.
int greedy_nms(const float* boxes, const float* scores, int n,
               float iou_thres, float conf_thres, uint8_t* keep_out) {
  std::vector<float> area(n);
  for (int i = 0; i < n; ++i) {
    area[i] = std::max(0.f, boxes[i * 4 + 2] - boxes[i * 4]) *
              std::max(0.f, boxes[i * 4 + 3] - boxes[i * 4 + 1]);
    keep_out[i] = 0;
  }
  std::vector<uint8_t> dead(n, 0);
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    if (dead[i] || scores[i] <= conf_thres) continue;
    keep_out[i] = 1;
    ++kept;
    const float* bi = boxes + i * 4;
    for (int j = i + 1; j < n; ++j) {
      if (dead[j]) continue;
      const float* bj = boxes + j * 4;
      float xx1 = std::max(bi[0], bj[0]), yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]), yy2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float iou = inter / (area[i] + area[j] - inter + 1e-7f);
      if (iou > iou_thres) dead[j] = 1;
    }
  }
  return kept;
}

// Frame complex64 IQ (interleaved re,im) into overlapping windows with a
// Hann window applied — host-side prep for the on-device STFT when captures
// stream from an SDR in int16/float32 (data-loader native path).
void frame_iq_hann(const float* iq_interleaved, int64_t n_samples,
                   float* out_frames, int n_fft, int hop) {
  int frames = (int)(1 + (n_samples - n_fft) / hop);
  std::vector<float> win(n_fft);
  for (int i = 0; i < n_fft; ++i)
    win[i] = 0.5f - 0.5f * std::cos(2.0 * M_PI * i / (n_fft - 1));
  for (int f = 0; f < frames; ++f) {
    const float* src = iq_interleaved + (size_t)f * hop * 2;
    float* dst = out_frames + (size_t)f * n_fft * 2;
    for (int i = 0; i < n_fft; ++i) {
      dst[i * 2] = src[i * 2] * win[i];
      dst[i * 2 + 1] = src[i * 2 + 1] * win[i];
    }
  }
}

}  // extern "C"
