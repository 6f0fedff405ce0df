// smg_host — native host-side runtime for the smg_tpu framework.
//
// The reference ships one native component: remoteApi.so, a C client with a
// background communication thread ferrying commands to CoppeliaSim
// (reference code/simulation/remoteApi.so, driven by vrep.py's ctypes
// wrappers). In the TPU-native design physics lives on-device, so the native
// layer's jobs become:
//
//   1. scene-asset ingestion: parse Wavefront .obj meshes (the reference's
//      datasets/{training,testing}/{enveloping,sucking} sets, robot.py:36-49)
//      and fit the analytic primitive + sphere-compound approximations the
//      device stepper consumes — heavy host-side preprocessing kept out of
//      Python;
//   2. asynchronous run logging: a lock-guarded ring buffer drained by a
//      background writer thread, so the training loop's host tap never
//      blocks on the filesystem (the role the comm thread played for RPC).
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <queue>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing + primitive fitting
// ---------------------------------------------------------------------------

// Shape type codes (must match smg_tpu.physics.shapes).
enum { SMG_BOX = 0, SMG_CYLINDER = 1, SMG_SPHERE = 2 };

struct FitResult {
  int32_t shape_type;
  float half_extents[3];   // box: half sizes; cyl: (R, R, hh); sphere: (R,R,R)
  float centroid[3];       // mesh centroid (for re-centering)
  float mass;              // at the given density
  float inertia[3];        // body-frame diagonal
  int32_t n_vertices;
  int32_t n_faces;
};

static bool parse_obj_vertices(const char* path,
                               std::vector<float>& verts,
                               int32_t& n_faces) {
  std::ifstream in(path);
  if (!in.is_open()) return false;
  std::string line;
  n_faces = 0;
  while (std::getline(in, line)) {
    if (line.size() < 2) continue;
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      std::istringstream ss(line.substr(2));
      float x, y, z;
      if (ss >> x >> y >> z) {
        verts.push_back(x);
        verts.push_back(y);
        verts.push_back(z);
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      n_faces++;
    }
  }
  return !verts.empty();
}

// Fit an axis-aligned primitive to the vertex cloud. Classification:
//  - near-isotropic extents with high radial fill       -> sphere
//  - one distinct axis with circular cross-section fill -> cylinder (z axis)
//  - otherwise                                          -> box
// The caller re-orients meshes up front (the reference's object sets are
// axis-aligned exports); a PCA pre-rotation hook can extend this later.
int smg_fit_obj(const char* path, float density, FitResult* out) {
  std::vector<float> v;
  int32_t n_faces = 0;
  if (!parse_obj_vertices(path, v, n_faces)) return -1;
  const size_t n = v.size() / 3;

  double c[3] = {0, 0, 0};
  for (size_t i = 0; i < n; i++)
    for (int k = 0; k < 3; k++) c[k] += v[3 * i + k];
  for (int k = 0; k < 3; k++) c[k] /= double(n);

  double he[3] = {0, 0, 0};
  for (size_t i = 0; i < n; i++)
    for (int k = 0; k < 3; k++) {
      double d = std::fabs(v[3 * i + k] - c[k]);
      if (d > he[k]) he[k] = d;
    }

  // Radial statistics in the xy cross-section and in 3D, plus the xy
  // angular coverage (a square's corners are equidistant like a circle's
  // samples, but occupy only 4 angular bins).
  double max_r_xy = 0.0, mean_r_xy = 0.0;
  double max_r_3d = 0.0, mean_r_3d = 0.0;
  bool angle_bins[16] = {false};
  for (size_t i = 0; i < n; i++) {
    double dx = v[3 * i] - c[0], dy = v[3 * i + 1] - c[1],
           dz = v[3 * i + 2] - c[2];
    double rxy = std::sqrt(dx * dx + dy * dy);
    double r3 = std::sqrt(dx * dx + dy * dy + dz * dz);
    max_r_xy = std::max(max_r_xy, rxy);
    max_r_3d = std::max(max_r_3d, r3);
    mean_r_xy += rxy;
    mean_r_3d += r3;
    if (rxy > 1e-9) {
      double a = std::atan2(dy, dx) + M_PI;
      int bin = std::min(15, int(a / (2.0 * M_PI) * 16.0));
      angle_bins[bin] = true;
    }
  }
  mean_r_xy /= double(n);
  mean_r_3d /= double(n);
  int n_angle_bins = 0;
  for (bool b : angle_bins) n_angle_bins += b;

  const double iso =
      std::min(std::min(he[0], he[1]), he[2]) /
      std::max(std::max(he[0], he[1]), std::max(he[2], 1e-9));
  const double xy_iso = std::min(he[0], he[1]) / std::max(he[0], he[1]);

  int32_t type;
  double hx = he[0], hy = he[1], hz = he[2];
  // Sphere: all extents similar AND vertices concentrated near max radius
  // (a cube's corner vertices sit at r = sqrt(3) * he, its mean is lower).
  if (iso > 0.9 && mean_r_3d > 0.8 * max_r_3d) {
    type = SMG_SPHERE;
    hx = hy = hz = max_r_3d;
  } else if (xy_iso > 0.9 && mean_r_xy > 0.8 * max_r_xy &&
             n_angle_bins >= 6) {
    // Circular xy cross-section: cylinder along z.
    type = SMG_CYLINDER;
    hx = hy = max_r_xy;
  } else {
    type = SMG_BOX;
  }

  out->shape_type = type;
  out->half_extents[0] = float(hx);
  out->half_extents[1] = float(hy);
  out->half_extents[2] = float(hz);
  out->centroid[0] = float(c[0]);
  out->centroid[1] = float(c[1]);
  out->centroid[2] = float(c[2]);
  out->n_vertices = int32_t(n);
  out->n_faces = n_faces;

  // Mass / inertia of the fitted primitive (mirrors shapes.mass_properties;
  // the device side applies its own simulation-mass floor).
  double m, I0, I1, I2;
  if (type == SMG_BOX) {
    double vol = 8.0 * hx * hy * hz;
    m = density * vol;
    I0 = m / 3.0 * (hy * hy + hz * hz);
    I1 = m / 3.0 * (hx * hx + hz * hz);
    I2 = m / 3.0 * (hx * hx + hy * hy);
  } else if (type == SMG_CYLINDER) {
    double vol = M_PI * hx * hx * 2.0 * hz;
    m = density * vol;
    I0 = I1 = m * (3 * hx * hx + 4 * hz * hz) / 12.0;
    I2 = 0.5 * m * hx * hx;
  } else {
    double vol = 4.0 / 3.0 * M_PI * hx * hx * hx;
    m = density * vol;
    I0 = I1 = I2 = 0.4 * m * hx * hx;
  }
  out->mass = float(m);
  out->inertia[0] = float(I0);
  out->inertia[1] = float(I1);
  out->inertia[2] = float(I2);
  return 0;
}

// Sphere-compound generation for a fitted primitive — identical scheme to
// smg_tpu.physics.shapes.sphere_compound (8 support + 1 center).
int smg_sphere_compound(int32_t shape_type, const float* half_extents,
                        float* out_offsets /* 9*3 */,
                        float* out_radii /* 9 */) {
  const float hx = half_extents[0], hy = half_extents[1],
              hz = half_extents[2];
  if (shape_type == SMG_BOX) {
    float r = 0.5f * std::min(hx, std::min(hy, hz));
    float ix = hx - r, iy = hy - r, iz = hz - r;
    static const int s[8][3] = {{-1, -1, -1}, {1, -1, -1}, {-1, 1, -1},
                                {1, 1, -1},   {-1, -1, 1}, {1, -1, 1},
                                {-1, 1, 1},   {1, 1, 1}};
    for (int i = 0; i < 8; i++) {
      out_offsets[3 * i] = s[i][0] * ix;
      out_offsets[3 * i + 1] = s[i][1] * iy;
      out_offsets[3 * i + 2] = s[i][2] * iz;
      out_radii[i] = r;
    }
    out_offsets[24] = out_offsets[25] = out_offsets[26] = 0.0f;
    out_radii[8] = std::min(hx, std::min(hy, hz));
  } else if (shape_type == SMG_CYLINDER) {
    float R = hx, hh = hz;
    float r = 0.5f * std::min(R, hh);
    float ring = R - r, zoff = hh - r;
    for (int i = 0; i < 8; i++) {
      float a = float(i) * float(2.0 * M_PI / 8.0);
      out_offsets[3 * i] = ring * std::cos(a);
      out_offsets[3 * i + 1] = ring * std::sin(a);
      out_offsets[3 * i + 2] = (i % 2 == 0) ? -zoff : zoff;
      out_radii[i] = r;
    }
    out_offsets[24] = out_offsets[25] = out_offsets[26] = 0.0f;
    out_radii[8] = std::min(R, hh);
  } else {
    for (int i = 0; i < 9; i++) {
      out_offsets[3 * i] = out_offsets[3 * i + 1] = out_offsets[3 * i + 2] =
          0.0f;
      out_radii[i] = hx;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Async binary log writer
// ---------------------------------------------------------------------------

struct AsyncLogger {
  std::FILE* file = nullptr;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::queue<std::vector<float>> queue;
  std::atomic<bool> stop{false};
  std::atomic<uint64_t> rows_written{0};

  void run() {
    for (;;) {
      std::vector<float> row;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) break;
          continue;
        }
        row = std::move(queue.front());
        queue.pop();
      }
      uint32_t len = uint32_t(row.size());
      std::fwrite(&len, sizeof(len), 1, file);
      std::fwrite(row.data(), sizeof(float), row.size(), file);
      rows_written.fetch_add(1);
    }
    std::fflush(file);
  }
};

void* smg_log_open(const char* path) {
  auto* lg = new AsyncLogger();
  lg->file = std::fopen(path, "wb");
  if (!lg->file) {
    delete lg;
    return nullptr;
  }
  lg->worker = std::thread([lg] { lg->run(); });
  return lg;
}

int smg_log_append(void* handle, const float* data, int32_t n) {
  auto* lg = static_cast<AsyncLogger*>(handle);
  if (!lg || !lg->file) return -1;
  {
    std::lock_guard<std::mutex> lk(lg->mu);
    lg->queue.emplace(data, data + n);
  }
  lg->cv.notify_one();
  return 0;
}

uint64_t smg_log_rows_written(void* handle) {
  return static_cast<AsyncLogger*>(handle)->rows_written.load();
}

int smg_log_close(void* handle) {
  auto* lg = static_cast<AsyncLogger*>(handle);
  if (!lg) return -1;
  lg->stop.store(true);
  lg->cv.notify_all();
  if (lg->worker.joinable()) lg->worker.join();
  std::fclose(lg->file);
  delete lg;
  return 0;
}

// Library version tag for the ctypes loader.
int smg_host_version() { return 10; }

}  // extern "C"
