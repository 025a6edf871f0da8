// ezplan — native motion-planning runtime for easyhec_tpu.
//
// The TPU-native framework keeps all device compute in JAX/XLA/Pallas; this
// library is the HOST-side native component replacing the reference's
// mplib/OMPL/FCL stack (reference: easyhec/modeling/models/rb_solve/
// collision_checker.py:23-105 — RRT planning + collision gating for the
// space-exploration loop). Same capabilities, first-party:
//   - forward kinematics over a serial/tree chain (revolute/prismatic/fixed,
//     mimic joints)
//   - sphere-set self-collision + environment point-cloud collision
//   - RRT-Connect with greedy shortcut smoothing
// Exposed as a C API consumed via ctypes (easyhec_tpu/io/native_planner.py),
// with the pure-Python planner as behavioral reference and fallback.
//
// Build: make -C native   (produces libezplan.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

struct Mat4 {
  double m[16];  // row-major
  static Mat4 identity() {
    Mat4 r{};
    r.m[0] = r.m[5] = r.m[10] = r.m[15] = 1.0;
    return r;
  }
};

Mat4 matmul(const Mat4& a, const Mat4& b) {
  Mat4 r{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
      r.m[i * 4 + j] = s;
    }
  return r;
}

Mat4 axis_angle(const double axis[3], double q) {
  const double c = std::cos(q), s = std::sin(q), t = 1.0 - c;
  const double x = axis[0], y = axis[1], z = axis[2];
  Mat4 r = Mat4::identity();
  r.m[0] = t * x * x + c;
  r.m[1] = t * x * y - s * z;
  r.m[2] = t * x * z + s * y;
  r.m[4] = t * x * y + s * z;
  r.m[5] = t * y * y + c;
  r.m[6] = t * y * z - s * x;
  r.m[8] = t * x * z - s * y;
  r.m[9] = t * y * z + s * x;
  r.m[10] = t * z * z + c;
  return r;
}

constexpr int kFixed = 0, kRevolute = 1, kPrismatic = 2;

struct LinkSpec {
  int parent;      // index into chain order, -1 root
  int joint_type;  // kFixed | kRevolute | kPrismatic
  Mat4 origin;
  double axis[3];
  int qpos_index;  // -1 for fixed
  double mimic_mult, mimic_off;
};

struct SphereSet {
  int link;  // chain link index
  std::vector<Vec3> centers;  // link frame
  std::vector<double> radii;
};

struct Planner {
  int n_dof = 0;
  std::vector<LinkSpec> links;
  std::vector<double> lower, upper;
  std::vector<SphereSet> spheres;
  std::vector<uint8_t> pair_check;  // [n_sets * n_sets]
  std::vector<Vec3> env_points;
  double env_margin = 0.02;
  double collision_margin = 0.0;

  std::vector<Mat4> fk(const double* q) const {
    std::vector<Mat4> poses(links.size());
    for (size_t i = 0; i < links.size(); ++i) {
      const LinkSpec& L = links[i];
      Mat4 T = (L.parent < 0) ? L.origin : matmul(poses[L.parent], L.origin);
      if (L.joint_type == kRevolute) {
        double v = q[L.qpos_index] * L.mimic_mult + L.mimic_off;
        T = matmul(T, axis_angle(L.axis, v));
      } else if (L.joint_type == kPrismatic) {
        double v = q[L.qpos_index] * L.mimic_mult + L.mimic_off;
        for (int r = 0; r < 3; ++r)
          T.m[r * 4 + 3] += (T.m[r * 4 + 0] * L.axis[0] + T.m[r * 4 + 1] * L.axis[1] +
                             T.m[r * 4 + 2] * L.axis[2]) * v;
      }
      poses[i] = T;
    }
    return poses;
  }

  bool in_collision(const double* q) const {
    auto poses = fk(q);
    const size_t S = spheres.size();
    // World-space sphere centers
    std::vector<std::vector<Vec3>> wc(S);
    for (size_t s = 0; s < S; ++s) {
      const Mat4& T = poses[spheres[s].link];
      wc[s].resize(spheres[s].centers.size());
      for (size_t k = 0; k < spheres[s].centers.size(); ++k) {
        const Vec3& c = spheres[s].centers[k];
        wc[s][k] = {T.m[0] * c.x + T.m[1] * c.y + T.m[2] * c.z + T.m[3],
                    T.m[4] * c.x + T.m[5] * c.y + T.m[6] * c.z + T.m[7],
                    T.m[8] * c.x + T.m[9] * c.y + T.m[10] * c.z + T.m[11]};
      }
    }
    // Self collision on checked pairs
    for (size_t a = 0; a < S; ++a)
      for (size_t b = 0; b < S; ++b) {
        if (!pair_check[a * S + b]) continue;
        for (size_t i = 0; i < wc[a].size(); ++i)
          for (size_t j = 0; j < wc[b].size(); ++j) {
            double ra = spheres[a].radii[i], rb = spheres[b].radii[j];
            if (ra <= 0 || rb <= 0) continue;
            double dx = wc[a][i].x - wc[b][j].x, dy = wc[a][i].y - wc[b][j].y,
                   dz = wc[a][i].z - wc[b][j].z;
            double d = std::sqrt(dx * dx + dy * dy + dz * dz);
            if (d - (ra + rb) < collision_margin) return true;
          }
      }
    // Environment
    if (!env_points.empty()) {
      for (size_t a = 0; a < S; ++a)
        for (size_t i = 0; i < wc[a].size(); ++i) {
          double r = spheres[a].radii[i];
          if (r <= 0) continue;
          for (const Vec3& p : env_points) {
            double dx = wc[a][i].x - p.x, dy = wc[a][i].y - p.y, dz = wc[a][i].z - p.z;
            if (std::sqrt(dx * dx + dy * dy + dz * dz) - r < env_margin) return true;
          }
        }
    }
    return false;
  }

  bool segment_free(const std::vector<double>& q0, const std::vector<double>& q1,
                    double step) const {
    double dist = 0;
    for (int i = 0; i < n_dof; ++i) dist = std::max(dist, std::fabs(q1[i] - q0[i]));
    int n = std::max(1, (int)std::ceil(dist / step));
    std::vector<double> q(n_dof);
    for (int s = 0; s <= n; ++s) {
      double f = (double)s / n;
      for (int i = 0; i < n_dof; ++i) q[i] = q0[i] + (q1[i] - q0[i]) * f;
      if (in_collision(q.data())) return false;
    }
    return true;
  }
};

double norm_diff(const std::vector<double>& a, const std::vector<double>& b) {
  double s = 0;
  for (size_t i = 0; i < a.size(); ++i) s += (a[i] - b[i]) * (a[i] - b[i]);
  return std::sqrt(s);
}

}  // namespace

extern "C" {

void* ezplan_create(int n_dof, int n_links, const int* parent, const int* joint_type,
                    const double* origins /*16*n_links row-major*/,
                    const double* axes /*3*n_links*/, const int* qpos_index,
                    const double* mimic_mult, const double* mimic_off,
                    const double* lower, const double* upper) {
  auto* p = new Planner();
  p->n_dof = n_dof;
  p->links.resize(n_links);
  for (int i = 0; i < n_links; ++i) {
    LinkSpec& L = p->links[i];
    L.parent = parent[i];
    L.joint_type = joint_type[i];
    std::memcpy(L.origin.m, origins + 16 * i, 16 * sizeof(double));
    for (int k = 0; k < 3; ++k) L.axis[k] = axes[3 * i + k];
    L.qpos_index = qpos_index[i];
    L.mimic_mult = mimic_mult[i];
    L.mimic_off = mimic_off[i];
  }
  p->lower.assign(lower, lower + n_dof);
  p->upper.assign(upper, upper + n_dof);
  return p;
}

void ezplan_add_spheres(void* h, int link, const double* centers, const double* radii,
                        int n) {
  auto* p = static_cast<Planner*>(h);
  SphereSet s;
  s.link = link;
  for (int i = 0; i < n; ++i) {
    s.centers.push_back({centers[3 * i], centers[3 * i + 1], centers[3 * i + 2]});
    s.radii.push_back(radii[i]);
  }
  p->spheres.push_back(std::move(s));
  size_t S = p->spheres.size();
  // Rebuild the pair matrix: caller sets it after all sets are added.
  p->pair_check.assign(S * S, 0);
}

void ezplan_set_pair_check(void* h, const uint8_t* pair, int n_sets) {
  auto* p = static_cast<Planner*>(h);
  p->pair_check.assign(pair, pair + (size_t)n_sets * n_sets);
}

void ezplan_set_env(void* h, const double* pts, int n, double margin) {
  auto* p = static_cast<Planner*>(h);
  p->env_points.clear();
  for (int i = 0; i < n; ++i)
    p->env_points.push_back({pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]});
  p->env_margin = margin;
}

int ezplan_in_collision(void* h, const double* q) {
  return static_cast<Planner*>(h)->in_collision(q) ? 1 : 0;
}

void ezplan_fk(void* h, const double* q, double* out /*16*n_links*/) {
  auto* p = static_cast<Planner*>(h);
  auto poses = p->fk(q);
  for (size_t i = 0; i < poses.size(); ++i)
    std::memcpy(out + 16 * i, poses[i].m, 16 * sizeof(double));
}

// RRT-Connect + shortcut. Returns number of waypoints written (<= max_pts),
// 0 on failure. Waypoints are row-major [n_pts, n_dof].
int ezplan_plan(void* h, const double* q_start, const double* q_goal, double step,
                int max_iters, double goal_bias, uint64_t seed, double* out_path,
                int max_pts) {
  auto* p = static_cast<Planner*>(h);
  const int D = p->n_dof;
  std::vector<double> qs(q_start, q_start + D), qg(q_goal, q_goal + D);
  if (p->in_collision(qg.data())) return 0;

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  auto emit = [&](const std::vector<std::vector<double>>& path) -> int {
    int n = std::min((int)path.size(), max_pts);
    for (int i = 0; i < n; ++i)
      std::memcpy(out_path + (size_t)i * D, path[i].data(), D * sizeof(double));
    return n;
  };

  if (p->segment_free(qs, qg, step / 2)) {
    return emit({qs, qg});
  }

  std::vector<std::vector<double>> nodes{qs};
  std::vector<int> parents{-1};
  bool connected = false;
  for (int it = 0; it < max_iters && !connected; ++it) {
    std::vector<double> target(D);
    if (uni(rng) < goal_bias) {
      target = qg;
    } else {
      for (int i = 0; i < D; ++i)
        target[i] = p->lower[i] + (p->upper[i] - p->lower[i]) * uni(rng);
    }
    int ni = 0;
    double bestd = 1e300;
    for (size_t i = 0; i < nodes.size(); ++i) {
      double d = norm_diff(nodes[i], target);
      if (d < bestd) {
        bestd = d;
        ni = (int)i;
      }
    }
    std::vector<double> qn(D);
    double scale = bestd <= step ? 1.0 : step / bestd;
    for (int i = 0; i < D; ++i) qn[i] = nodes[ni][i] + (target[i] - nodes[ni][i]) * scale;
    if (!p->segment_free(nodes[ni], qn, step / 2)) continue;
    nodes.push_back(qn);
    parents.push_back(ni);
    if (p->segment_free(qn, qg, step / 2)) {
      nodes.push_back(qg);
      parents.push_back((int)nodes.size() - 2);
      connected = true;
    }
  }
  if (!connected) return 0;

  std::vector<std::vector<double>> path;
  for (int i = (int)nodes.size() - 1; i >= 0; i = parents[i]) path.push_back(nodes[i]);
  std::reverse(path.begin(), path.end());

  // Greedy shortcut smoothing
  for (int round = 0; round < 60 && path.size() > 2; ++round) {
    size_t i = rng() % path.size(), j = rng() % path.size();
    if (i > j) std::swap(i, j);
    if (j - i <= 1) continue;
    if (p->segment_free(path[i], path[j], step / 2)) {
      path.erase(path.begin() + i + 1, path.begin() + j);
    }
  }
  return emit(path);
}

void ezplan_destroy(void* h) { delete static_cast<Planner*>(h); }

}  // extern "C"
