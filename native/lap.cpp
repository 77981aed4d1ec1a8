// Rectangular linear assignment (Jonker-Volgenant shortest augmenting path).
//
// Native runtime component of bcm3_tpu: the observed-vs-simulated cell
// matching runs once per likelihood evaluation inside the sampler hot loop
// (reference: src/cellpop/DataLikelihoodTimePoints.cpp:220-289 and the
// vendored dependencies/HungarianAlgorithm-master used by the reference).
// The Python layer calls this through ctypes from a jax host callback; a
// scipy fallback is used when the shared library has not been built.
//
// Algorithm: shortest-augmenting-path LAP for an n_rows <= n_cols cost
// matrix, O(n_rows * n_cols^2) worst case (Jonker & Volgenant 1987 /
// Crouse 2016 rectangular variant).
//
// Build: g++ -O3 -shared -fPIC -o libbcm3lap.so lap.cpp

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

extern "C" {

// Solve min-cost assignment of rows to columns.
// cost: row-major (n_rows x n_cols), n_rows <= n_cols required.
// row_to_col: out, length n_rows.
// Returns total cost, or +inf if infeasible (should not happen for finite
// cost matrices).
double bcm3_lap_solve(int n_rows, int n_cols, const double* cost,
                      int* row_to_col) {
  if (n_rows <= 0) return 0.0;
  if (n_rows > n_cols) return std::numeric_limits<double>::infinity();

  const double INF = std::numeric_limits<double>::infinity();
  // Hungarian algorithm with potentials and a virtual column 0
  // (classical O(n_rows^2 * n_cols) formulation).
  std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
  std::vector<int> p(n_cols + 1, 0);    // p[j] = 1-based row matched to col j
  std::vector<int> way(n_cols + 1, 0);  // predecessor column on the path

  for (int i = 1; i <= n_rows; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n_cols + 1, INF);
    std::vector<char> used(n_cols + 1, 0);
    do {
      used[j0] = 1;
      const int i0 = p[j0];
      int j1 = -1;
      double delta = INF;
      for (int j = 1; j <= n_cols; ++j) {
        if (used[j]) continue;
        const double cur =
            cost[(size_t)(i0 - 1) * n_cols + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 < 0 || delta == INF) return INF;  // infeasible
      for (int j = 0; j <= n_cols; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      const int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }

  for (int r = 0; r < n_rows; ++r) row_to_col[r] = -1;
  for (int j = 1; j <= n_cols; ++j) {
    if (p[j] > 0) row_to_col[p[j] - 1] = j - 1;
  }
  double total = 0.0;
  for (int r = 0; r < n_rows; ++r) {
    if (row_to_col[r] < 0) return INF;
    total += cost[(size_t)r * n_cols + row_to_col[r]];
  }
  return total;
}

// Batched variant: B independent problems with shared shape.
void bcm3_lap_solve_batch(int batch, int n_rows, int n_cols,
                          const double* cost, int* row_to_col,
                          double* totals) {
  for (int b = 0; b < batch; ++b) {
    totals[b] = bcm3_lap_solve(n_rows, n_cols,
                               cost + (size_t)b * n_rows * n_cols,
                               row_to_col + (size_t)b * n_rows);
  }
}

}  // extern "C"

// Masked matched-logp batch: the full per-row semantics of the Python
// hungarian_match_logp (bcm3_tpu/cellpop/data_likelihood.py) moved into
// one native call so the sampler's host-match phase makes a single
// GIL-releasing ctypes crossing per data likelihood per batch instead of
// one per batch ROW (reference scoring semantics:
// src/cellpop/DataLikelihoodTimeCourse.cpp:187-355,
// DataLikelihoodTimePoints.cpp:200-289 with
// hungarianMinimumWeightPerfectMatching maximizing total log-likelihood).
//
// Per problem b with cost_logp (n_obs x n_sim) and validity masks:
//   - no valid observed rows            -> 0.0
//   - fewer valid simulated than obs    -> -inf
//   - otherwise maximize the total logp of a perfect matching of valid
//     rows into valid columns (non-finite entries clamped to -1e100);
//     a total at or below -1e90 means an observed cell could only pair
//     with an impossible column -> -inf.
namespace {

double match_logp_one(int n_obs, int n_sim, const double* cost_logp,
                      const uint8_t* obs_valid, const uint8_t* sim_valid,
                      std::vector<double>& sub, std::vector<int>& obs_ix,
                      std::vector<int>& sim_ix, std::vector<int>& r2c) {
  const double NEG_INF = -std::numeric_limits<double>::infinity();
  obs_ix.clear();
  sim_ix.clear();
  for (int i = 0; i < n_obs; ++i)
    if (obs_valid[i]) obs_ix.push_back(i);
  for (int j = 0; j < n_sim; ++j)
    if (sim_valid[j]) sim_ix.push_back(j);
  const int k = (int)obs_ix.size(), m = (int)sim_ix.size();
  if (k == 0) return 0.0;
  if (m < k) return NEG_INF;
  sub.resize((size_t)k * m);
  for (int r = 0; r < k; ++r) {
    const double* row = cost_logp + (size_t)obs_ix[r] * n_sim;
    for (int c = 0; c < m; ++c) {
      const double v = row[sim_ix[c]];
      // maximize logp == minimize -logp; clamp non-finite to -1e100
      sub[(size_t)r * m + c] = -(std::isfinite(v) ? v : -1e100);
    }
  }
  r2c.resize(k);
  const double neg_total = bcm3_lap_solve(k, m, sub.data(), r2c.data());
  const double total = -neg_total;
  if (!std::isfinite(total) || total <= -1e90) return NEG_INF;
  return total;
}

}  // namespace

extern "C" {

// cost_logp: (batch, n_obs, n_sim) row-major; obs_valid: (batch, n_obs);
// sim_valid: (batch, n_sim); totals: (batch,) out. n_threads <= 1 runs
// serial; otherwise the batch is chunked across std::threads (the caller
// holds no GIL during this call, so the threads genuinely parallelize).
void bcm3_lap_match_logp_batch(int batch, int n_obs, int n_sim,
                               const double* cost_logp,
                               const uint8_t* obs_valid,
                               const uint8_t* sim_valid, int n_threads,
                               double* totals) {
  auto run = [&](int b_lo, int b_hi) {
    std::vector<double> sub;
    std::vector<int> obs_ix, sim_ix, r2c;
    for (int b = b_lo; b < b_hi; ++b) {
      totals[b] = match_logp_one(
          n_obs, n_sim, cost_logp + (size_t)b * n_obs * n_sim,
          obs_valid + (size_t)b * n_obs, sim_valid + (size_t)b * n_sim,
          sub, obs_ix, sim_ix, r2c);
    }
  };
  if (n_threads <= 1 || batch < 2 * n_threads) {
    run(0, batch);
    return;
  }
  std::vector<std::thread> pool;
  const int chunk = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * chunk;
    const int hi = lo + chunk < batch ? lo + chunk : batch;
    if (lo >= hi) break;
    pool.emplace_back(run, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
