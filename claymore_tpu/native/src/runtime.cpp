// claymore_tpu native runtime.
//
// C++ implementations of the host-side subsystems the reference implements
// natively:
//   * an asynchronous IO job queue with a worker thread
//     (reference: Library/MnSystem/IO/IO.h:10-67) driving BGEO particle
//     dumps (reference: Library/MnSystem/IO/ParticleIO.hpp:14-29, vendored
//     partio) — here a self-contained big-endian BGEO v5 serializer;
//   * weighted sample elimination for Poisson-disk particle seeding
//     (reference: Library/MnSystem/IO/PoissonDisk/SampleGenerator.h + the
//     vendored cySampleElim.h) — re-implemented with a uniform hash grid
//     and a binary max-heap.
//
// Exposed as a flat C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// big-endian helpers
// ---------------------------------------------------------------------------

inline void put_be32(std::string& out, uint32_t v) {
  out.push_back(char((v >> 24) & 0xff));
  out.push_back(char((v >> 16) & 0xff));
  out.push_back(char((v >> 8) & 0xff));
  out.push_back(char(v & 0xff));
}

inline void put_be16(std::string& out, uint16_t v) {
  out.push_back(char((v >> 8) & 0xff));
  out.push_back(char(v & 0xff));
}

inline void put_bef32(std::string& out, float f) {
  uint32_t v;
  std::memcpy(&v, &f, 4);
  put_be32(out, v);
}

inline void put_hstr(std::string& out, const char* s) {
  uint16_t n = uint16_t(std::strlen(s));
  put_be16(out, n);
  out.append(s, n);
}

// ---------------------------------------------------------------------------
// BGEO v5 serialization (positions + float attributes)
// ---------------------------------------------------------------------------

std::string serialize_bgeo(int64_t n, const float* pos,
                           int n_attrs, const char* const* names,
                           const int* widths, const float* const* attrs) {
  std::string out;
  int64_t rec_words = 4;
  for (int a = 0; a < n_attrs; ++a) rec_words += widths[a];
  out.reserve(64 + size_t(n) * size_t(rec_words) * 4);

  put_be32(out, 0x4267656f);  // 'Bgeo'
  out.push_back('V');
  put_be32(out, 5);            // version
  put_be32(out, uint32_t(n));  // nPoints
  put_be32(out, 0);            // nPrims
  put_be32(out, 0);            // nPointGroups
  put_be32(out, 0);            // nPrimGroups
  put_be32(out, uint32_t(n_attrs));  // nPointAttrib (excl. position)
  put_be32(out, 0);            // nVertexAttrib
  put_be32(out, 0);            // nPrimAttrib
  put_be32(out, 0);            // nAttrib (detail)

  for (int a = 0; a < n_attrs; ++a) {
    put_hstr(out, names[a]);
    put_be16(out, uint16_t(widths[a]));
    put_be32(out, 0);  // houdini type FLOAT
    for (int k = 0; k < widths[a]; ++k) put_be32(out, 0);  // defaults
  }

  for (int64_t i = 0; i < n; ++i) {
    put_bef32(out, pos[i * 3 + 0]);
    put_bef32(out, pos[i * 3 + 1]);
    put_bef32(out, pos[i * 3 + 2]);
    put_bef32(out, 1.0f);  // homogeneous w
    for (int a = 0; a < n_attrs; ++a)
      for (int k = 0; k < widths[a]; ++k)
        put_bef32(out, attrs[a][i * widths[a] + k]);
  }

  out.push_back(char(0x00));
  out.push_back(char(0xff));
  return out;
}

// ---------------------------------------------------------------------------
// async job queue (reference IO singleton)
// ---------------------------------------------------------------------------

class JobQueue {
 public:
  JobQueue() : worker_([this] { run(); }) {}

  ~JobQueue() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    worker_.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push_back(std::move(job));
      ++pending_;
    }
    cv_.notify_one();
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop_front();
      }
      job();
      {
        std::lock_guard<std::mutex> lk(mu_);
        --pending_;
      }
      done_cv_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<std::function<void()>> jobs_;
  int pending_ = 0;
  bool stop_ = false;
  std::thread worker_;
};

JobQueue* queue_instance() {
  static JobQueue q;
  return &q;
}

}  // namespace

extern "C" {

// Synchronous BGEO write.  Returns 0 on success.
int cm_write_bgeo(const char* path, int64_t n, const float* positions,
                  int n_attrs, const char* const* names, const int* widths,
                  const float* const* attrs) {
  std::string blob = serialize_bgeo(n, positions, n_attrs, names, widths, attrs);
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  size_t w = std::fwrite(blob.data(), 1, blob.size(), f);
  std::fclose(f);
  return w == blob.size() ? 0 : 2;
}

// Asynchronous BGEO write: copies the buffers and returns immediately; the
// worker thread serializes + writes (reference IO::insert_job).
int cm_async_write_bgeo(const char* path, int64_t n, const float* positions,
                        int n_attrs, const char* const* names,
                        const int* widths, const float* const* attrs) {
  std::string p(path);
  std::vector<float> pos(positions, positions + n * 3);
  std::vector<std::string> nms(n_attrs);
  std::vector<int> ws(widths, widths + n_attrs);
  std::vector<std::vector<float>> data(n_attrs);
  for (int a = 0; a < n_attrs; ++a) {
    nms[a] = names[a];
    data[a].assign(attrs[a], attrs[a] + n * widths[a]);
  }
  queue_instance()->submit([p = std::move(p), n, pos = std::move(pos),
                            nms = std::move(nms), ws = std::move(ws),
                            data = std::move(data)]() {
    std::vector<const char*> nptr;
    std::vector<const float*> dptr;
    for (auto& s : nms) nptr.push_back(s.c_str());
    for (auto& d : data) dptr.push_back(d.data());
    cm_write_bgeo(p.c_str(), n, pos.data(), int(nms.size()),
                  nptr.empty() ? nullptr : nptr.data(),
                  ws.empty() ? nullptr : ws.data(),
                  dptr.empty() ? nullptr : dptr.data());
  });
  return 0;
}

void cm_flush() { queue_instance()->flush(); }

// ---------------------------------------------------------------------------
// Weighted sample elimination (Poisson-disk thinning).
//
// Candidates in[n*3] -> keep target m samples with approximate blue-noise
// spacing.  Weights w_i = sum_j (1 - d_ij / (2 r_max))^8 over neighbors
// within 2 r_max; repeatedly eliminate the max-weight sample and update its
// neighbors (the cySampleElim algorithm, re-implemented with a hash grid +
// lazy max-heap).  Writes the kept indices to out_idx (size >= m).
// ---------------------------------------------------------------------------

int cm_sample_elimination(const float* pts, int64_t n, int64_t target,
                          float extent_x, float extent_y, float extent_z,
                          int32_t* out_idx) {
  if (target >= n) {
    for (int64_t i = 0; i < n; ++i) out_idx[i] = int32_t(i);
    return int(n);
  }
  const double volume = double(extent_x) * extent_y * extent_z;
  const double r_max = std::cbrt(volume / (4.0 * std::sqrt(2.0) * double(target)));
  const double r2max = 2.0 * r_max;

  // hash grid with cell size 2 r_max
  const double cell = r2max;
  int gx = std::max(1, int(extent_x / cell));
  int gy = std::max(1, int(extent_y / cell));
  int gz = std::max(1, int(extent_z / cell));
  auto cell_of = [&](const float* p) {
    int cx = std::min(gx - 1, std::max(0, int(p[0] / extent_x * gx)));
    int cy = std::min(gy - 1, std::max(0, int(p[1] / extent_y * gy)));
    int cz = std::min(gz - 1, std::max(0, int(p[2] / extent_z * gz)));
    return (cx * gy + cy) * gz + cz;
  };
  std::vector<std::vector<int32_t>> grid(size_t(gx) * gy * gz);
  for (int64_t i = 0; i < n; ++i) grid[cell_of(pts + i * 3)].push_back(int32_t(i));

  auto for_neighbors = [&](int64_t i, auto&& fn) {
    const float* p = pts + i * 3;
    int cx = std::min(gx - 1, std::max(0, int(p[0] / extent_x * gx)));
    int cy = std::min(gy - 1, std::max(0, int(p[1] / extent_y * gy)));
    int cz = std::min(gz - 1, std::max(0, int(p[2] / extent_z * gz)));
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          int x = cx + dx, y = cy + dy, z = cz + dz;
          if (x < 0 || y < 0 || z < 0 || x >= gx || y >= gy || z >= gz) continue;
          for (int32_t j : grid[size_t(x * gy + y) * gz + z]) {
            if (j == i) continue;
            double ddx = pts[j * 3 + 0] - p[0];
            double ddy = pts[j * 3 + 1] - p[1];
            double ddz = pts[j * 3 + 2] - p[2];
            double d = std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
            if (d < r2max) fn(j, d);
          }
        }
  };

  std::vector<double> weight(n, 0.0);
  for (int64_t i = 0; i < n; ++i)
    for_neighbors(i, [&](int32_t, double d) {
      double t = 1.0 - d / r2max;
      weight[i] += t * t * t * t * t * t * t * t;
    });

  // lazy max-heap of (weight, index)
  std::vector<char> alive(n, 1);
  std::priority_queue<std::pair<double, int32_t>> heap;
  for (int64_t i = 0; i < n; ++i) heap.push({weight[i], int32_t(i)});

  int64_t remaining = n;
  while (remaining > target && !heap.empty()) {
    auto [w, i] = heap.top();
    heap.pop();
    if (!alive[i] || w != weight[i]) continue;  // stale entry
    alive[i] = 0;
    --remaining;
    for_neighbors(i, [&](int32_t j, double d) {
      if (!alive[j]) return;
      double t = 1.0 - d / r2max;
      weight[j] -= t * t * t * t * t * t * t * t;
      heap.push({weight[j], j});
    });
  }

  int64_t k = 0;
  for (int64_t i = 0; i < n && k < target; ++i)
    if (alive[i]) out_idx[k++] = int32_t(i);
  return int(k);
}

}  // extern "C"
