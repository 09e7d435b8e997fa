// Native host-side image runtime: undistortion-map construction + bilinear
// remap into the fixed 320x224 f=159.5 virtual pinhole camera.
//
// Rebuilds, without OpenCV, the camera-preparation path of the reference
// (cuahn_ros/ov_core/src/cam/CamBase.h:165-186):
//   - initialize_undist_map        <- cv::initUndistortRectifyMap (radtan)
//   - initialize_undist_map_fisheye<- cv::fisheye::initUndistortRectifyMap
//   - undistort_and_resize_img     <- cv::remap(..., INTER_LINEAR)
// plus a batched, multithreaded remap for offline dataset preprocessing
// (the per-frame 2.69 ms "image load" stage of the baseline, BASELINE.md).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Pinhole {
  double fx, fy, cx, cy;
};

// Build the virtual-camera intrinsics: FoV 90 deg in width
// => f = (W-1)/2, c = ((W-1)/2, (H-1)/2)  (CamBase.h:167-170, warp.py:16-19).
Pinhole virtual_cam(int out_w, int out_h) {
  const double f = (out_w - 1.0) / 2.0;  // tan(45 deg) = 1
  return {f, f, (out_w - 1.0) / 2.0, (out_h - 1.0) / 2.0};
}

}  // namespace

extern "C" {

// Radial-tangential (plumb-bob, k1 k2 p1 p2) undistortion map.
// For every virtual-camera pixel: back-project, distort with the raw
// camera's model, project with the raw intrinsics -> (map_x, map_y).
// Semantics identical to cv::initUndistortRectifyMap with newK = virtual K.
void build_undist_map_radtan(const double* k_raw,  // fx fy cx cy
                             const double* dist,   // k1 k2 p1 p2
                             int out_w, int out_h,
                             float* map_x, float* map_y) {
  const Pinhole vk = virtual_cam(out_w, out_h);
  const double fx = k_raw[0], fy = k_raw[1], cx = k_raw[2], cy = k_raw[3];
  const double k1 = dist[0], k2 = dist[1], p1 = dist[2], p2 = dist[3];
  for (int v = 0; v < out_h; ++v) {
    for (int u = 0; u < out_w; ++u) {
      const double x = (u - vk.cx) / vk.fx;
      const double y = (v - vk.cy) / vk.fy;
      const double r2 = x * x + y * y;
      const double radial = 1.0 + k1 * r2 + k2 * r2 * r2;
      const double xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x);
      const double yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y;
      map_x[v * out_w + u] = static_cast<float>(fx * xd + cx);
      map_y[v * out_w + u] = static_cast<float>(fy * yd + cy);
    }
  }
}

// Equidistant (Kannala-Brandt fisheye, k1..k4) undistortion map —
// cv::fisheye::initUndistortRectifyMap semantics.
void build_undist_map_fisheye(const double* k_raw, const double* dist,
                              int out_w, int out_h,
                              float* map_x, float* map_y) {
  const Pinhole vk = virtual_cam(out_w, out_h);
  const double fx = k_raw[0], fy = k_raw[1], cx = k_raw[2], cy = k_raw[3];
  const double k1 = dist[0], k2 = dist[1], k3 = dist[2], k4 = dist[3];
  for (int v = 0; v < out_h; ++v) {
    for (int u = 0; u < out_w; ++u) {
      const double x = (u - vk.cx) / vk.fx;
      const double y = (v - vk.cy) / vk.fy;
      const double r = std::sqrt(x * x + y * y);
      double scale = 1.0;
      if (r > 1e-12) {
        const double th = std::atan(r);
        const double th2 = th * th;
        const double th_d =
            th * (1.0 + k1 * th2 + k2 * th2 * th2 + k3 * th2 * th2 * th2 +
                  k4 * th2 * th2 * th2 * th2);
        scale = th_d / r;
      }
      map_x[v * out_w + u] = static_cast<float>(fx * (x * scale) + cx);
      map_y[v * out_w + u] = static_cast<float>(fy * (y * scale) + cy);
    }
  }
}

// Bilinear remap of one uint8 image (cv::remap INTER_LINEAR, border 0).
void remap_u8(const uint8_t* src, int src_w, int src_h,
              const float* map_x, const float* map_y,
              int out_w, int out_h, uint8_t* dst) {
  for (int i = 0; i < out_w * out_h; ++i) {
    const float sx = map_x[i];
    const float sy = map_y[i];
    const int x0 = static_cast<int>(std::floor(sx));
    const int y0 = static_cast<int>(std::floor(sy));
    const float wx = sx - x0;
    const float wy = sy - y0;
    float acc = 0.0f;
    const int xs[2] = {x0, x0 + 1};
    const int ys[2] = {y0, y0 + 1};
    const float wxs[2] = {1.0f - wx, wx};
    const float wys[2] = {1.0f - wy, wy};
    for (int dy = 0; dy < 2; ++dy) {
      for (int dx = 0; dx < 2; ++dx) {
        const int xi = xs[dx];
        const int yi = ys[dy];
        if (xi >= 0 && xi < src_w && yi >= 0 && yi < src_h) {
          acc += wys[dy] * wxs[dx] * src[yi * src_w + xi];
        }
      }
    }
    const float r = acc + 0.5f;
    dst[i] = static_cast<uint8_t>(r < 0.f ? 0 : (r > 255.f ? 255 : r));
  }
}

// Batched multithreaded remap: n images in, n undistorted 224x320 out.
void remap_u8_batch(const uint8_t* src, int n, int src_w, int src_h,
                    const float* map_x, const float* map_y,
                    int out_w, int out_h, uint8_t* dst, int n_threads) {
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      remap_u8(src + static_cast<size_t>(i) * src_w * src_h, src_w, src_h,
               map_x, map_y, out_w, out_h,
               dst + static_cast<size_t>(i) * out_w * out_h);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
