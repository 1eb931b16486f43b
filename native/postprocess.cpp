// Native pre/postprocess library for the TPU YOLO stack.
//
// Implements the predictor's pre/post contract (the same one every
// reference C++ example reimplements — see reference examples/
// YOLOv8-CPP-Inference/inference.cpp:1-197): letterbox resize+pad,
// (4+nc, A) tensor decode, confidence filter, class-offset greedy NMS,
// coordinate rescale back to the original image.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear letterbox: src HxWx3 uint8 -> dst SxSx3 uint8 (gray 114 pad,
// centered, min-ratio). Returns scale gain; writes pad offsets.
void letterbox_u8(const uint8_t* src, int h, int w, uint8_t* dst, int size,
                  float* gain_out, int* padw_out, int* padh_out) {
  float r = std::min((float)size / h, (float)size / w);
  int nh = (int)std::round(h * r), nw = (int)std::round(w * r);
  float dh = (size - nh) / 2.0f, dw = (size - nw) / 2.0f;
  int top = (int)std::round(dh - 0.1f), left = (int)std::round(dw - 0.1f);
  std::memset(dst, 114, (size_t)size * size * 3);
  // bilinear resize into the padded window
  for (int y = 0; y < nh; ++y) {
    float sy = (y + 0.5f) / r - 0.5f;
    int y0 = (int)std::floor(sy);
    float fy = sy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    uint8_t* drow = dst + ((size_t)(y + top) * size + left) * 3;
    const uint8_t* s0 = src + (size_t)y0 * w * 3;
    const uint8_t* s1 = src + (size_t)y1 * w * 3;
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) / r - 0.5f;
      int x0 = (int)std::floor(sx);
      float fx = sx - x0;
      int x1 = std::min(x0 + 1, w - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float v00 = s0[x0 * 3 + c], v01 = s0[x1 * 3 + c];
        float v10 = s1[x0 * 3 + c], v11 = s1[x1 * 3 + c];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        drow[x * 3 + c] = (uint8_t)std::lround(std::min(std::max(v, 0.0f), 255.0f));
      }
    }
  }
  *gain_out = r;
  *padw_out = left;
  *padh_out = top;
}

struct Cand {
  float x1, y1, x2, y2, score;
  int cls;
};

// Decode (4+nc, A) channel-major predictions (xywh pixels + class
// sigmoids), confidence-filter, per-class greedy NMS.
// out: max_det rows of [x1,y1,x2,y2,score,cls]; returns n kept.
int decode_nms(const float* pred, int nc, int na, float conf_thres,
               float iou_thres, int max_det, int multi_label, float* out) {
  std::vector<Cand> cands;
  cands.reserve(1024);
  const float* px = pred;            // row 0: x
  const float* py = pred + na;       // row 1: y
  const float* pw = pred + 2 * (size_t)na;
  const float* ph = pred + 3 * (size_t)na;
  for (int a = 0; a < na; ++a) {
    float bx = px[a], by = py[a], bw = pw[a], bh = ph[a];
    float x1 = bx - bw / 2, y1 = by - bh / 2, x2 = bx + bw / 2, y2 = by + bh / 2;
    if (multi_label) {
      for (int c = 0; c < nc; ++c) {
        float s = pred[(4 + (size_t)c) * na + a];
        if (s > conf_thres) cands.push_back({x1, y1, x2, y2, s, c});
      }
    } else {
      int best = 0;
      float bs = -1;
      for (int c = 0; c < nc; ++c) {
        float s = pred[(4 + (size_t)c) * na + a];
        if (s > bs) { bs = s; best = c; }
      }
      if (bs > conf_thres) cands.push_back({x1, y1, x2, y2, bs, best});
    }
  }
  std::sort(cands.begin(), cands.end(),
            [](const Cand& a, const Cand& b) { return a.score > b.score; });
  int n = 0;
  std::vector<char> removed(cands.size(), 0);
  for (size_t i = 0; i < cands.size() && n < max_det; ++i) {
    if (removed[i]) continue;
    const Cand& a = cands[i];
    out[n * 6 + 0] = a.x1; out[n * 6 + 1] = a.y1;
    out[n * 6 + 2] = a.x2; out[n * 6 + 3] = a.y2;
    out[n * 6 + 4] = a.score; out[n * 6 + 5] = (float)a.cls;
    ++n;
    float area_a = std::max(0.f, a.x2 - a.x1) * std::max(0.f, a.y2 - a.y1);
    for (size_t j = i + 1; j < cands.size(); ++j) {
      if (removed[j] || cands[j].cls != a.cls) continue;
      const Cand& b = cands[j];
      float ix1 = std::max(a.x1, b.x1), iy1 = std::max(a.y1, b.y1);
      float ix2 = std::min(a.x2, b.x2), iy2 = std::min(a.y2, b.y2);
      float inter = std::max(0.f, ix2 - ix1) * std::max(0.f, iy2 - iy1);
      float area_b = std::max(0.f, b.x2 - b.x1) * std::max(0.f, b.y2 - b.y1);
      float iou = inter / (area_a + area_b - inter + 1e-7f);
      if (iou > iou_thres) removed[j] = 1;
    }
  }
  return n;
}

// Rescale letterboxed xyxy boxes back to the original image (in place).
void rescale_boxes(float* boxes, int n, float gain, int padw, int padh,
                   int orig_h, int orig_w) {
  for (int i = 0; i < n; ++i) {
    float* b = boxes + (size_t)i * 6;
    b[0] = std::min(std::max((b[0] - padw) / gain, 0.0f), (float)orig_w);
    b[1] = std::min(std::max((b[1] - padh) / gain, 0.0f), (float)orig_h);
    b[2] = std::min(std::max((b[2] - padw) / gain, 0.0f), (float)orig_w);
    b[3] = std::min(std::max((b[3] - padh) / gain, 0.0f), (float)orig_h);
  }
}

}  // extern "C"
