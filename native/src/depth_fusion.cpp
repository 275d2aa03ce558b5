// Native host-side depth-fusion kernel (C++ reference implementation).
//
// The reference project's only first-party native-performance component is
// its Burst-compiled DepthExtractionJob (an AOT ARM64 SIMD kernel; see
// Assets/Scripts/InferenceEngine/IEExecutor.cs:53-179 and the Burst build
// artifact noted in SURVEY.md §2.2). This file is the equivalent native
// kernel for our framework's CPU path: same math, data-parallel across a
// thread pool (the Burst job ran batches of 64 across worker threads,
// IEExecutor.cs:647), exposed through a C ABI for ctypes.
//
// The TPU path uses the fused XLA/Pallas kernel in
// xrseg_tpu/ops/depth_fusion.py; this exists for host-side parity, for
// runtimes without an accelerator, and as the oracle the tests cross-check.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float half_to_float(uint16_t h) {
  // Bit-exact fp16 -> fp32 (the reference hand-rolls this for Burst,
  // IEExecutor.cs:159-178; we do the same so CPU results are bit-identical).
  uint32_t sign = (h >> 15) & 0x1;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t f;
  if (exp == 0) {
    if (man == 0) {
      f = sign << 31;
    } else {
      // subnormal: normalize
      exp = 127 - 15 + 1;
      while ((man & 0x400) == 0) {
        man <<= 1;
        exp--;
      }
      man &= 0x3FF;
      f = (sign << 31) | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    f = (sign << 31) | 0x7F800000u | (man << 13);
  } else {
    f = (sign << 31) | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &f, sizeof(out));
  return out;
}

struct Params {
  const uint16_t* depth;
  const float* mask;
  int depth_w, depth_h;
  int mask_w, mask_h;
  int sampling_step;
  float confidence_threshold;
  float min_depth, max_depth;
  float box_cx, box_cy, box_w, box_h;
  float cam_pos[3];
  float cam_quat[4];  // x, y, z, w
  float focal[2];
  float principal[2];
  float sensor_res[2];
  float* out_positions;  // [N*3]
  float* out_depths;     // [N]
  int32_t* out_valid;    // [N]
};

inline void quat_rotate(const float q[4], const float v[3], float out[3]) {
  const float ux = q[0], uy = q[1], uz = q[2], w = q[3];
  // t = 2 * cross(u, v)
  const float tx = 2.0f * (uy * v[2] - uz * v[1]);
  const float ty = 2.0f * (uz * v[0] - ux * v[2]);
  const float tz = 2.0f * (ux * v[1] - uy * v[0]);
  // out = v + w*t + cross(u, t)
  out[0] = v[0] + w * tx + (uy * tz - uz * ty);
  out[1] = v[1] + w * ty + (uz * tx - ux * tz);
  out[2] = v[2] + w * tz + (ux * ty - uy * tx);
}

void run_range(const Params& p, int begin, int end) {
  const int grid_w = p.mask_w / p.sampling_step;
  for (int index = begin; index < end; ++index) {
    p.out_valid[index] = 0;
    const int ly = index / grid_w;
    const int lx = index % grid_w;
    const int y = ly * p.sampling_step;
    const int x = lx * p.sampling_step;
    if (y >= p.mask_h || x >= p.mask_w) continue;

    const float mval = p.mask[y * p.mask_w + x];
    if (mval <= p.confidence_threshold) continue;

    const float norm_x = static_cast<float>(x) / p.mask_w;
    const float norm_y = static_cast<float>(y) / p.mask_h;
    const float img_x = p.box_cx - p.box_w * 0.5f + norm_x * p.box_w;
    const float img_y = p.box_cy - p.box_h * 0.5f + norm_y * p.box_h;
    float u = img_x / 640.0f;
    float v = img_y / 640.0f;
    u = u < 0.f ? 0.f : (u > 1.f ? 1.f : u);
    v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);

    const int dx = static_cast<int>(u * (p.depth_w - 1));
    const int dy = static_cast<int>((1.0f - v) * (p.depth_h - 1));
    const int didx = dy * p.depth_w + dx;
    if (didx < 0 || didx >= p.depth_w * p.depth_h) continue;

    const float depth_m = half_to_float(p.depth[didx]);
    if (depth_m <= p.min_depth || depth_m >= p.max_depth) continue;

    const float cam_px = u * p.sensor_res[0];
    const float cam_py = (1.0f - v) * p.sensor_res[1];
    float dir[3] = {(cam_px - p.principal[0]) / p.focal[0],
                    (cam_py - p.principal[1]) / p.focal[1], 1.0f};
    const float inv_len =
        1.0f / std::sqrt(dir[0] * dir[0] + dir[1] * dir[1] + dir[2] * dir[2]);
    dir[0] *= inv_len;
    dir[1] *= inv_len;
    dir[2] *= inv_len;

    float dirw[3];
    quat_rotate(p.cam_quat, dir, dirw);

    p.out_positions[index * 3 + 0] = p.cam_pos[0] + dirw[0] * depth_m;
    p.out_positions[index * 3 + 1] = p.cam_pos[1] + dirw[1] * depth_m;
    p.out_positions[index * 3 + 2] = p.cam_pos[2] + dirw[2] * depth_m;
    p.out_depths[index] = depth_m;
    p.out_valid[index] = 1;
  }
}

}  // namespace

extern "C" {

// Returns the number of valid points written. Output arrays must hold
// (mask_w/step)*(mask_h/step) entries.
int xrseg_depth_fusion(
    const uint16_t* depth, int depth_w, int depth_h, const float* mask,
    int mask_w, int mask_h, int sampling_step, float confidence_threshold,
    float min_depth, float max_depth, float box_cx, float box_cy, float box_w,
    float box_h, const float* cam_pos, const float* cam_quat,
    const float* focal, const float* principal, const float* sensor_res,
    float* out_positions, float* out_depths, int32_t* out_valid,
    int num_threads) {
  Params p;
  p.depth = depth;
  p.mask = mask;
  p.depth_w = depth_w;
  p.depth_h = depth_h;
  p.mask_w = mask_w;
  p.mask_h = mask_h;
  p.sampling_step = sampling_step;
  p.confidence_threshold = confidence_threshold;
  p.min_depth = min_depth;
  p.max_depth = max_depth;
  p.box_cx = box_cx;
  p.box_cy = box_cy;
  p.box_w = box_w;
  p.box_h = box_h;
  std::memcpy(p.cam_pos, cam_pos, sizeof(p.cam_pos));
  std::memcpy(p.cam_quat, cam_quat, sizeof(p.cam_quat));
  std::memcpy(p.focal, focal, sizeof(p.focal));
  std::memcpy(p.principal, principal, sizeof(p.principal));
  std::memcpy(p.sensor_res, sensor_res, sizeof(p.sensor_res));
  p.out_positions = out_positions;
  p.out_depths = out_depths;
  p.out_valid = out_valid;

  const int total = (mask_w / sampling_step) * (mask_h / sampling_step);
  int nthreads = num_threads > 0
                     ? num_threads
                     : static_cast<int>(std::thread::hardware_concurrency());
  if (nthreads < 1) nthreads = 1;
  if (nthreads > total / 64 + 1) nthreads = total / 64 + 1;

  if (nthreads == 1) {
    run_range(p, 0, total);
  } else {
    std::vector<std::thread> workers;
    const int chunk = (total + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      const int begin = t * chunk;
      const int end = begin + chunk < total ? begin + chunk : total;
      if (begin >= end) break;
      workers.emplace_back([&p, begin, end] { run_range(p, begin, end); });
    }
    for (auto& w : workers) w.join();
  }

  int count = 0;
  for (int i = 0; i < total; ++i) count += out_valid[i];
  return count;
}

}  // extern "C"
