// Native (C++) dense OSQP-style ADMM QP solver — the framework's
// high-performance host-side reference core.
//
// The reference project's only native dependency is the OSQP C solver reached
// through Python bindings (/root/reference/src/trajectorySimulate.py:242-245);
// that package is absent from this image, so this translation unit provides an
// independent native implementation of the same published algorithm (Stellato
// et al., arXiv:1711.08013): modified Ruiz equilibration, vector-rho splitting
// with boosted equality rows, a dense Cholesky KKT solve, OSQP termination
// criteria, and primal/dual infeasibility certificates with the same
// scaled-space + decisive-support-margin semantics as ops/admm.py and
// tools/osqp_ref.py (see the discussion there).
//
// Exposed through a C ABI for ctypes (tools/native_solver.py). Used by the
// deviation harness (fast high-accuracy oracle runs) and as a CPU serving
// fallback; the TPU compute path is ops/admm.py.

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr double kMinScaling = 1e-4;
constexpr double kMaxScaling = 1e4;
constexpr double kRhoMin = 1e-6;
constexpr double kRhoMax = 1e6;
constexpr double kRhoEqScale = 1e3;

struct Settings {
  double rho = 0.1;
  double sigma = 1e-6;
  double alpha = 1.6;
  double eps_abs = 1e-3;
  double eps_rel = 1e-3;
  double eps_pinf = 1e-4;
  double eps_dinf = 1e-4;
  double pinf_support_margin = 1.0;
  int max_iter = 4000;
  int check_every = 25;
  int scaling_iters = 10;
  int adaptive_rho = 1;
  int adaptive_rho_interval = 50;
  double adaptive_rho_tol = 5.0;
};

enum Status {
  kUnsolved = 0,
  kSolved = 1,
  kMaxIter = 2,
  kPrimalInfeasible = 3,
  kDualInfeasible = 4,
};

// Row-major dense matrix helpers.
inline double norm_inf(const double* v, int n) {
  double m = 0.0;
  for (int i = 0; i < n; ++i) m = std::max(m, std::fabs(v[i]));
  return m;
}

// y = M x  (M: r x c row-major)
void matvec(const double* M, const double* x, double* y, int r, int c) {
  for (int i = 0; i < r; ++i) {
    double acc = 0.0;
    const double* row = M + static_cast<size_t>(i) * c;
    for (int j = 0; j < c; ++j) acc += row[j] * x[j];
    y[i] = acc;
  }
}

// y = M' x  (M: r x c row-major; y has length c)
void matvec_t(const double* M, const double* x, double* y, int r, int c) {
  std::fill(y, y + c, 0.0);
  for (int i = 0; i < r; ++i) {
    const double* row = M + static_cast<size_t>(i) * c;
    const double xi = x[i];
    if (xi == 0.0) continue;
    for (int j = 0; j < c; ++j) y[j] += row[j] * xi;
  }
}

// In-place lower Cholesky of SPD n x n row-major matrix. Returns 0 on success.
int cholesky(std::vector<double>& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[static_cast<size_t>(j) * n + j];
    for (int k = 0; k < j; ++k) {
      const double ljk = M[static_cast<size_t>(j) * n + k];
      d -= ljk * ljk;
    }
    if (d <= 0.0) return 1;
    const double dj = std::sqrt(d);
    M[static_cast<size_t>(j) * n + j] = dj;
    for (int i = j + 1; i < n; ++i) {
      double acc = M[static_cast<size_t>(i) * n + j];
      for (int k = 0; k < j; ++k)
        acc -= M[static_cast<size_t>(i) * n + k] * M[static_cast<size_t>(j) * n + k];
      M[static_cast<size_t>(i) * n + j] = acc / dj;
    }
  }
  return 0;
}

// Solve L L' x = b with lower-triangular L (row-major), in place over x.
void chol_solve(const std::vector<double>& L, double* x, int n) {
  for (int i = 0; i < n; ++i) {
    double acc = x[i];
    for (int k = 0; k < i; ++k) acc -= L[static_cast<size_t>(i) * n + k] * x[k];
    x[i] = acc / L[static_cast<size_t>(i) * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double acc = x[i];
    for (int k = i + 1; k < n; ++k) acc -= L[static_cast<size_t>(k) * n + i] * x[k];
    x[i] = acc / L[static_cast<size_t>(i) * n + i];
  }
}

struct Workspace {
  int n, m;
  Settings st;
  std::vector<double> Ps, qs, As, ls, us;  // scaled data
  std::vector<double> P0, q0, A0, l0, u0;  // unscaled copies
  std::vector<double> D, E;
  double c = 1.0;
  double rho_bar;
  std::vector<double> rho;
  std::vector<double> L;  // Cholesky factor of Ps + sigma I + As' diag(rho) As
  std::vector<double> x, y, z;  // scaled iterates

  void set_rho(double rb) {
    rho_bar = rb;
    for (int i = 0; i < m; ++i) {
      const bool eq = std::isfinite(l0[i]) && std::isfinite(u0[i]) &&
                      (u0[i] - l0[i] < 1e-12);
      double r = std::min(std::max(eq ? rb * kRhoEqScale : rb, kRhoMin), kRhoMax);
      rho[i] = r;
    }
  }

  int factor() {
    L.assign(static_cast<size_t>(n) * n, 0.0);
    // M = Ps + sigma I + As' diag(rho) As
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        L[static_cast<size_t>(i) * n + j] = Ps[static_cast<size_t>(i) * n + j];
    for (int i = 0; i < n; ++i) L[static_cast<size_t>(i) * n + i] += st.sigma;
    for (int r = 0; r < m; ++r) {
      const double* row = As.data() + static_cast<size_t>(r) * n;
      const double w = rho[r];
      for (int i = 0; i < n; ++i) {
        const double wi = w * row[i];
        if (wi == 0.0) continue;
        for (int j = 0; j < n; ++j)
          L[static_cast<size_t>(i) * n + j] += wi * row[j];
      }
    }
    return cholesky(L, n);
  }

  void equilibrate() {
    D.assign(n, 1.0);
    E.assign(m, 1.0);
    c = 1.0;
    Ps = P0; qs = q0; As = A0;
    std::vector<double> dn(n), dm(m);
    for (int it = 0; it < st.scaling_iters; ++it) {
      for (int j = 0; j < n; ++j) {
        double cn = 0.0;
        for (int i = 0; i < n; ++i)
          cn = std::max(cn, std::fabs(Ps[static_cast<size_t>(i) * n + j]));
        for (int i = 0; i < m; ++i)
          cn = std::max(cn, std::fabs(As[static_cast<size_t>(i) * n + j]));
        cn = std::min(std::max(cn, kMinScaling), kMaxScaling);
        dn[j] = 1.0 / std::sqrt(cn);
      }
      for (int i = 0; i < m; ++i) {
        double rn = norm_inf(As.data() + static_cast<size_t>(i) * n, n);
        rn = std::min(std::max(rn, kMinScaling), kMaxScaling);
        dm[i] = 1.0 / std::sqrt(rn);
      }
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
          Ps[static_cast<size_t>(i) * n + j] *= dn[i] * dn[j];
      for (int i = 0; i < m; ++i)
        for (int j = 0; j < n; ++j)
          As[static_cast<size_t>(i) * n + j] *= dm[i] * dn[j];
      for (int j = 0; j < n; ++j) qs[j] *= dn[j];
      for (int j = 0; j < n; ++j) D[j] *= dn[j];
      for (int i = 0; i < m; ++i) E[i] *= dm[i];
      // cost scaling
      double mean_pc = 0.0;
      for (int j = 0; j < n; ++j) {
        double cn = 0.0;
        for (int i = 0; i < n; ++i)
          cn = std::max(cn, std::fabs(Ps[static_cast<size_t>(i) * n + j]));
        mean_pc += cn;
      }
      mean_pc /= std::max(n, 1);
      double nq = norm_inf(qs.data(), n);
      double gamma =
          1.0 / std::max(std::min(std::max(std::max(mean_pc, nq), kMinScaling),
                                  kMaxScaling),
                         kMinScaling);
      for (auto& v : Ps) v *= gamma;
      for (auto& v : qs) v *= gamma;
      c *= gamma;
    }
    scale_bounds();
  }

  void scale_bounds() {
    ls.resize(m);
    us.resize(m);
    for (int i = 0; i < m; ++i) {
      ls[i] = std::isfinite(l0[i]) ? E[i] * l0[i] : l0[i];
      us[i] = std::isfinite(u0[i]) ? E[i] * u0[i] : u0[i];
    }
  }
};

}  // namespace

extern "C" {

// Creates a workspace; returns an opaque handle (or nullptr on failure).
void* osqp_ref_setup(int n, int m, const double* P, const double* q,
                     const double* A, const double* l, const double* u,
                     const double* settings10) {
  auto* w = new Workspace();
  w->n = n;
  w->m = m;
  if (settings10) {
    w->st.rho = settings10[0];
    w->st.sigma = settings10[1];
    w->st.alpha = settings10[2];
    w->st.eps_abs = settings10[3];
    w->st.eps_rel = settings10[4];
    w->st.eps_pinf = settings10[5];
    w->st.eps_dinf = settings10[6];
    w->st.max_iter = static_cast<int>(settings10[7]);
    w->st.check_every = static_cast<int>(settings10[8]);
    w->st.adaptive_rho = static_cast<int>(settings10[9]);
  }
  w->P0.assign(P, P + static_cast<size_t>(n) * n);
  w->q0.assign(q, q + n);
  w->A0.assign(A, A + static_cast<size_t>(m) * n);
  w->l0.assign(l, l + m);
  w->u0.assign(u, u + m);
  w->rho.assign(m, w->st.rho);
  w->equilibrate();
  w->set_rho(w->st.rho);
  if (w->factor() != 0) {
    delete w;
    return nullptr;
  }
  w->x.assign(n, 0.0);
  w->y.assign(m, 0.0);
  w->z.assign(m, 0.0);
  return w;
}

void osqp_ref_update(void* handle, const double* l, const double* u,
                     const double* A) {
  auto* w = static_cast<Workspace*>(handle);
  bool refactor = false;
  if (l) w->l0.assign(l, l + w->m);
  if (u) w->u0.assign(u, u + w->m);
  if (A) {
    w->A0.assign(A, A + static_cast<size_t>(w->m) * w->n);
    for (int i = 0; i < w->m; ++i)
      for (int j = 0; j < w->n; ++j)
        w->As[static_cast<size_t>(i) * w->n + j] =
            w->A0[static_cast<size_t>(i) * w->n + j] * w->E[i] * w->D[j];
    refactor = true;
  }
  if (l || u) {
    w->scale_bounds();
    std::vector<double> old = w->rho;
    w->set_rho(w->rho_bar);
    if (old != w->rho) refactor = true;
  }
  if (refactor) w->factor();
}

// Runs the ADMM loop; fills x_out (n), y_out (m); returns status; iters_out.
int osqp_ref_solve(void* handle, double* x_out, double* y_out, int* iters_out) {
  auto* w = static_cast<Workspace*>(handle);
  const int n = w->n, m = w->m;
  const Settings& st = w->st;
  std::vector<double> rhs(n), xt(n), zt(m), ztmp(m), ynew(m), dx(n), dy(m),
      tmp_n(n), tmp_m(m);
  // iterates at the last termination check: infeasibility certificates test
  // the delta accumulated over the whole check interval (matches ops.admm /
  // tools/osqp_ref.py — see ops.admm for the fp32 rationale)
  std::vector<double> x_chk(w->x), y_chk(w->y);
  int status = kMaxIter;
  int it = 0;
  for (it = 1; it <= st.max_iter; ++it) {
    // rhs = sigma x - qs + As'(rho z - y)
    for (int i = 0; i < m; ++i) tmp_m[i] = w->rho[i] * w->z[i] - w->y[i];
    matvec_t(w->As.data(), tmp_m.data(), rhs.data(), m, n);
    for (int j = 0; j < n; ++j) rhs[j] += st.sigma * w->x[j] - w->qs[j];
    xt = rhs;
    chol_solve(w->L, xt.data(), n);
    matvec(w->As.data(), xt.data(), zt.data(), m, n);
    for (int j = 0; j < n; ++j) {
      w->x[j] = st.alpha * xt[j] + (1 - st.alpha) * w->x[j];
    }
    for (int i = 0; i < m; ++i) {
      ztmp[i] = st.alpha * zt[i] + (1 - st.alpha) * w->z[i];
      double zn = ztmp[i] + w->y[i] / w->rho[i];
      zn = std::min(std::max(zn, w->ls[i]), w->us[i]);
      w->y[i] = w->y[i] + w->rho[i] * (ztmp[i] - zn);
      w->z[i] = zn;
    }

    if (it % st.check_every == 0 || it == st.max_iter) {
      for (int j = 0; j < n; ++j) { dx[j] = w->x[j] - x_chk[j]; x_chk[j] = w->x[j]; }
      for (int i = 0; i < m; ++i) { dy[i] = w->y[i] - y_chk[i]; y_chk[i] = w->y[i]; }
      // residuals (unscaled)
      matvec(w->As.data(), w->x.data(), tmp_m.data(), m, n);
      double rp = 0, rp_rel = 0;
      for (int i = 0; i < m; ++i) {
        const double einv = 1.0 / w->E[i];
        rp = std::max(rp, std::fabs(einv * (tmp_m[i] - w->z[i])));
        rp_rel = std::max(rp_rel, std::fabs(einv * tmp_m[i]));
        rp_rel = std::max(rp_rel, std::fabs(einv * w->z[i]));
      }
      matvec(w->Ps.data(), w->x.data(), tmp_n.data(), n, n);
      std::vector<double> aty(n);
      matvec_t(w->As.data(), w->y.data(), aty.data(), m, n);
      double rd = 0, rd_rel = 0;
      const double cinv = 1.0 / w->c;
      for (int j = 0; j < n; ++j) {
        const double dinv = 1.0 / w->D[j];
        rd = std::max(rd, std::fabs(cinv * dinv * (tmp_n[j] + w->qs[j] + aty[j])));
        rd_rel = std::max(rd_rel, std::fabs(cinv * dinv * tmp_n[j]));
        rd_rel = std::max(rd_rel, std::fabs(cinv * dinv * aty[j]));
        rd_rel = std::max(rd_rel, std::fabs(cinv * dinv * w->qs[j]));
      }
      if (rp <= st.eps_abs + st.eps_rel * rp_rel &&
          rd <= st.eps_abs + st.eps_rel * rd_rel) {
        status = kSolved;
        break;
      }
      // primal infeasibility (scaled space, projected delta-y, absolute gate,
      // decisive support margin — see tools/osqp_ref.py)
      {
        std::vector<double> v(dy);
        for (int i = 0; i < m; ++i) {
          const bool uinf = !std::isfinite(w->us[i]);
          const bool linf = !std::isfinite(w->ls[i]);
          if (uinf && linf) v[i] = 0.0;
          else if (uinf) v[i] = std::min(v[i], 0.0);
          else if (linf) v[i] = std::max(v[i], 0.0);
        }
        const double nv = norm_inf(v.data(), m);
        if (nv > st.eps_pinf) {
          std::vector<double> atv(n);
          matvec_t(w->As.data(), v.data(), atv.data(), m, n);
          if (norm_inf(atv.data(), n) <= st.eps_pinf * nv) {
            double sup = 0.0;
            for (int i = 0; i < m; ++i) {
              if (v[i] > 0) sup += w->us[i] * v[i];
              else if (v[i] < 0) sup += w->ls[i] * v[i];
            }
            const double thresh = std::max(st.eps_pinf, st.pinf_support_margin);
            if (std::isfinite(sup) && sup <= -thresh * nv) {
              status = kPrimalInfeasible;
              break;
            }
          }
        }
      }
      // dual infeasibility
      {
        const double nv = norm_inf(dx.data(), n);
        if (nv > st.eps_dinf) {
          std::vector<double> pv(n);
          matvec(w->Ps.data(), dx.data(), pv.data(), n, n);
          double qv = 0.0;
          for (int j = 0; j < n; ++j) qv += w->qs[j] * dx[j];
          if (norm_inf(pv.data(), n) <= st.eps_dinf * nv &&
              qv <= -st.eps_dinf * nv) {
            std::vector<double> av(m);
            matvec(w->As.data(), dx.data(), av.data(), m, n);
            bool ok = true;
            for (int i = 0; i < m && ok; ++i) {
              if (std::isfinite(w->us[i]) && av[i] > st.eps_dinf * nv) ok = false;
              if (std::isfinite(w->ls[i]) && av[i] < -st.eps_dinf * nv) ok = false;
            }
            if (ok) {
              status = kDualInfeasible;
              break;
            }
          }
        }
      }
      // adaptive rho
      if (st.adaptive_rho && it % st.adaptive_rho_interval == 0) {
        const double num = rp / std::max(rp_rel, 1e-10);
        const double den = std::max(rd / std::max(rd_rel, 1e-10), 1e-10);
        const double ratio = std::sqrt(num / den);
        if (ratio > st.adaptive_rho_tol || ratio < 1.0 / st.adaptive_rho_tol) {
          const double nr = std::min(std::max(w->rho_bar * ratio, kRhoMin),
                                     kRhoMax / kRhoEqScale);
          if (nr != w->rho_bar) {
            w->set_rho(nr);
            w->factor();
          }
        }
      }
    }
  }
  for (int j = 0; j < n; ++j) x_out[j] = w->D[j] * w->x[j];
  for (int i = 0; i < m; ++i) y_out[i] = (1.0 / w->c) * w->E[i] * w->y[i];
  *iters_out = it;
  return status;
}

void osqp_ref_warm_start(void* handle, const double* x, const double* y) {
  auto* w = static_cast<Workspace*>(handle);
  if (x) {
    for (int j = 0; j < w->n; ++j) w->x[j] = x[j] / w->D[j];
    matvec(w->As.data(), w->x.data(), w->z.data(), w->m, w->n);
  }
  if (y)
    for (int i = 0; i < w->m; ++i) w->y[i] = (w->c / w->E[i]) * y[i];
}

void osqp_ref_free(void* handle) { delete static_cast<Workspace*>(handle); }

}  // extern "C"
