// Minimal C++ consumer of the framework's native postprocess library
// (native/libyolopost.so) driving an exported TFLite model end-to-end:
// raw image -> letterbox -> model -> decode+NMS -> rescale.
//
// The reference repo's C++ examples (YOLOv8-CPP-Inference etc.) each
// reimplement this contract by hand; here it is the shared native
// library the Python stack also uses (tests/test_native.py).
//
// Build:  see CMakeLists.txt (TFLite optional — without it the demo runs
//         the postprocess path on synthetic predictions, exercising the
//         full native contract without a runtime dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void letterbox_u8(const uint8_t* src, int h, int w, uint8_t* dst, int size,
                  float* gain, int* padw, int* padh);
int decode_nms(const float* pred, int nc, int na, float conf_thres,
               float iou_thres, int max_det, int multi_label, float* out);
void rescale_boxes(float* boxes, int n, float gain, int padw, int padh,
                   int oh, int ow);
}

int main(int argc, char** argv) {
  const int size = 640, nc = 80;
  const int oh = 480, ow = 800;  // pretend camera frame

  // 1) synthetic BGR frame + letterbox to the network input
  std::vector<uint8_t> frame(oh * ow * 3);
  for (size_t i = 0; i < frame.size(); ++i) frame[i] = uint8_t(i * 2654435761u >> 24);
  std::vector<uint8_t> net_in(size * size * 3);
  float gain = 0.f;
  int padw = 0, padh = 0;
  letterbox_u8(frame.data(), oh, ow, net_in.data(), size, &gain, &padw, &padh);
  std::printf("letterbox: gain=%.4f pad=(%d,%d)\n", gain, padw, padh);

  // 2) model forward. With a real artifact, feed net_in to the TFLite C
  //    API / PJRT-loaded StableHLO and read back (4+nc, A) floats. The
  //    demo fabricates two confident boxes so the pipeline is runnable
  //    anywhere.
  const int na = 8400;
  std::vector<float> pred((4 + nc) * na, 0.f);
  auto put = [&](int a, float cx, float cy, float w_, float h_, int cls, float conf) {
    pred[0 * na + a] = cx; pred[1 * na + a] = cy;
    pred[2 * na + a] = w_; pred[3 * na + a] = h_;
    pred[(4 + cls) * na + a] = conf;
  };
  put(100, 320.f, 320.f, 80.f, 60.f, 0, 0.9f);
  put(101, 322.f, 321.f, 82.f, 61.f, 0, 0.6f);  // duplicate -> suppressed
  put(500, 100.f, 500.f, 40.f, 40.f, 2, 0.7f);

  // 3) decode + NMS + rescale back to frame coordinates
  std::vector<float> dets(300 * 6);
  int n = decode_nms(pred.data(), nc, na, 0.25f, 0.45f, 300, 0, dets.data());
  rescale_boxes(dets.data(), n, gain, padw, padh, oh, ow);

  std::printf("%d detections\n", n);
  for (int i = 0; i < n; ++i) {
    const float* d = &dets[i * 6];
    std::printf("  box [%.1f %.1f %.1f %.1f] conf %.2f cls %d\n",
                d[0], d[1], d[2], d[3], d[4], int(d[5]));
  }
  return n == 2 ? 0 : 1;  // NMS must keep exactly the two real objects
}
