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

#include <cstddef>
#include <cstdint>
#include <limits>
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
