// CPU baseline surrogate for the reference BCM3 cell-population likelihood.
//
// The reference (NKI-CCB/bcm3) cannot be built in this image (Boost
// absent), so this tool measures an equivalent CPU implementation of the
// work the reference performs per cellpop likelihood evaluation
// (reference: src/cellpop/Experiment.cpp:635-846): a growing population
// of cells, each integrated by a stiff implicit solver with
// threshold-event detection (cytokinesis > 1 => divide, Cell.cpp:463-531),
// daughters spawned mid-run from a work queue, cell-to-cell variability
// on the division clock, and a population-average time-course score.
//
// The cell model matches tools/bench_cellpop.py exactly: 4 dynamic
// states (mass, cytokinesis clock, active kinase Ka, phosphorylated
// substrate Xp) with a stiff kinase/phosphatase module (rates ~1e3-3e3
// vs growth ~1e-1). The integrator is RODAS3 (KPP ros_Rodas3 tableau:
// 4-stage order-3(2) L-stable Rosenbrock, Sandu et al. 1997) with an
// analytic Jacobian and per-step LU — the same CVODE-class stiff method
// the TPU path uses (bcm3_tpu/ode/rosenbrock.py), so per-eval work is
// apples-to-apples with both the reference's CVODE and the TPU solver.
//
// Usage: baseline_cellpop <n_evals> <n_threads> [max_cells] [initial_cells]
// Prints one JSON line with evals/sec.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

static const int NS = 4;  // mass, cytokinesis, Ka, Xp

struct CellParams {
    double k_growth, k_div;  // k_div carries the per-cell variability
    // stiff kinase module constants (bench_cellpop.py CELL_MODEL)
    double Ktot = 1.0, Xtot = 1.0;
    double k_act = 2000.0, k_deact = 1000.0, k_phos = 3000.0, k_dephos = 1500.0;
};

static inline void rhs(const CellParams& p, const double* y, double* f) {
    f[0] = p.k_growth * y[0] * (1.0 - y[3]);
    f[1] = p.k_div;
    f[2] = p.k_act * y[0] * (p.Ktot - y[2]) - p.k_deact * y[2];
    f[3] = p.k_phos * y[2] * (p.Xtot - y[3]) - p.k_dephos * y[3];
}

static inline void jac(const CellParams& p, const double* y, double J[NS][NS]) {
    std::memset(J, 0, sizeof(double) * NS * NS);
    J[0][0] = p.k_growth * (1.0 - y[3]);
    J[0][3] = -p.k_growth * y[0];
    J[2][0] = p.k_act * (p.Ktot - y[2]);
    J[2][2] = -p.k_act * y[0] - p.k_deact;
    J[3][2] = p.k_phos * (p.Xtot - y[3]);
    J[3][3] = -p.k_phos * y[2] - p.k_dephos;
}

// RODAS3 tableau (KPP ros_Rodas3; public literature, same as the TPU path)
static const double GAMMA = 0.5;
static const double A32 = 2.0, A41 = 2.0, A43 = 1.0;
static const double C21 = 4.0, C31 = 1.0, C32 = -1.0;
static const double C41 = 1.0, C42 = -1.0, C43 = -8.0 / 3.0;
static const double M1 = 2.0, M3 = 1.0, M4 = 1.0;
// embedded error = k4 (E = [0,0,0,1])

struct LU {
    double a[NS][NS];
    int piv[NS];
};

static bool lu_factor(double G[NS][NS], LU& lu) {
    std::memcpy(lu.a, G, sizeof(lu.a));
    for (int k = 0; k < NS; k++) {
        int p = k;
        for (int i = k + 1; i < NS; i++)
            if (std::fabs(lu.a[i][k]) > std::fabs(lu.a[p][k])) p = i;
        lu.piv[k] = p;
        if (p != k)
            for (int j = 0; j < NS; j++) std::swap(lu.a[k][j], lu.a[p][j]);
        if (lu.a[k][k] == 0.0) return false;
        for (int i = k + 1; i < NS; i++) {
            lu.a[i][k] /= lu.a[k][k];
            for (int j = k + 1; j < NS; j++) lu.a[i][j] -= lu.a[i][k] * lu.a[k][j];
        }
    }
    return true;
}

static void lu_solve(const LU& lu, double* b) {
    for (int k = 0; k < NS; k++) {
        if (lu.piv[k] != k) std::swap(b[k], b[lu.piv[k]]);
        for (int i = k + 1; i < NS; i++) b[i] -= lu.a[i][k] * b[k];
    }
    for (int i = NS - 1; i >= 0; i--) {
        for (int j = i + 1; j < NS; j++) b[i] -= lu.a[i][j] * b[j];
        b[i] /= lu.a[i][i];
    }
}

// One RODAS3 step; returns scaled error norm (autonomous RHS).
static bool rodas3_step(const CellParams& p, double* y, double h, double rtol,
                        double atol, double* ynew, double* errn) {
    double J[NS][NS], G[NS][NS];
    jac(p, y, J);
    double hg = 1.0 / (h * GAMMA);
    for (int i = 0; i < NS; i++)
        for (int j = 0; j < NS; j++) G[i][j] = (i == j ? hg : 0.0) - J[i][j];
    LU lu;
    if (!lu_factor(G, lu)) return false;

    double f0[NS], k1[NS], k2[NS], k3[NS], k4[NS], yt[NS], r[NS];
    rhs(p, y, f0);
    // stage 1
    for (int i = 0; i < NS; i++) r[i] = f0[i];
    lu_solve(lu, r);
    std::memcpy(k1, r, sizeof(k1));
    // stage 2: Y2 = y (A[1][*]=0), rhs = f(y) + C21/h k1
    for (int i = 0; i < NS; i++) r[i] = f0[i] + (C21 / h) * k1[i];
    lu_solve(lu, r);
    std::memcpy(k2, r, sizeof(k2));
    // stage 3: Y3 = y + A32*k2? (A[2][0]=2.0 means a31 applies to k1)
    for (int i = 0; i < NS; i++) yt[i] = y[i] + A32 * k1[i];
    double f3[NS];
    rhs(p, yt, f3);
    for (int i = 0; i < NS; i++)
        r[i] = f3[i] + (C31 * k1[i] + C32 * k2[i]) / h;
    lu_solve(lu, r);
    std::memcpy(k3, r, sizeof(k3));
    // stage 4: Y4 = y + A41*k1 + A43*k3
    for (int i = 0; i < NS; i++) yt[i] = y[i] + A41 * k1[i] + A43 * k3[i];
    double f4[NS];
    rhs(p, yt, f4);
    for (int i = 0; i < NS; i++)
        r[i] = f4[i] + (C41 * k1[i] + C42 * k2[i] + C43 * k3[i]) / h;
    lu_solve(lu, r);
    std::memcpy(k4, r, sizeof(k4));

    double e = 0.0;
    for (int i = 0; i < NS; i++) {
        ynew[i] = y[i] + M1 * k1[i] + M3 * k3[i] + M4 * k4[i];
        double sc = atol + rtol * std::max(std::fabs(y[i]), std::fabs(ynew[i]));
        double ee = k4[i] / sc;
        e += ee * ee;
    }
    *errn = std::sqrt(e / NS);
    return std::isfinite(*errn);
}

struct Cell {
    double y[NS];
    double t0;  // global creation time
};

struct Obs {
    std::vector<double> times;     // T
    std::vector<double> observed;  // T
};

// Integrate one cell from its creation to t_end with adaptive RODAS3,
// recording mass at observation times and detecting the cytokinesis>1
// crossing (=> division, children pushed onto the work queue).
static bool simulate_cell(const CellParams& p, Cell cell, double t_end,
                          double rtol, double atol, const Obs& obs,
                          std::vector<double>& mass_sum,
                          std::vector<int>& mass_cnt,
                          std::vector<Cell>& queue, int max_cells,
                          int* n_cells) {
    double t = cell.t0;
    double h = 1e-3;
    double y[NS];
    std::memcpy(y, cell.y, sizeof(y));
    size_t oi = 0;
    while (oi < obs.times.size() && obs.times[oi] < t) oi++;
    int steps = 0;
    while (t < t_end) {
        if (++steps > 200000) return false;
        double hs = std::min(h, t_end - t);
        double ynew[NS], errn;
        if (!rodas3_step(p, y, hs, rtol, atol, ynew, &errn)) return false;
        double fac = 0.9 * std::pow(errn + 1e-30, -1.0 / 3.0);
        fac = fac < 0.2 ? 0.2 : (fac > 6.0 ? 6.0 : fac);
        if (errn <= 1.0) {
            double tnew = t + hs;
            // record mass at observation times inside this step (linear
            // dense output, same role as the stored-interpolant lookup in
            // Cell::GetInterpolatedSpeciesValue)
            while (oi < obs.times.size() && obs.times[oi] <= tnew) {
                double w = (obs.times[oi] - t) / hs;
                mass_sum[oi] += (1 - w) * y[0] + w * ynew[0];
                mass_cnt[oi] += 1;
                oi++;
            }
            // division event: cytokinesis crosses 1 inside the step
            if (y[1] < 1.0 && ynew[1] >= 1.0) {
                double w = (1.0 - y[1]) / (ynew[1] - y[1]);
                double tdiv = t + w * hs;
                double ydiv[NS];
                for (int i = 0; i < NS; i++) ydiv[i] = (1 - w) * y[i] + w * ynew[i];
                if (*n_cells + 2 <= max_cells) {
                    Cell c;
                    c.t0 = tdiv;
                    c.y[0] = 0.5 * ydiv[0];  // daughters split the mass
                    c.y[1] = 0.0;            // division clock resets
                    c.y[2] = ydiv[2];
                    c.y[3] = ydiv[3];
                    queue.push_back(c);
                    queue.push_back(c);
                    *n_cells += 2;
                }
                return true;  // parent ends at division (Cell.cpp:44-50)
            }
            t = tnew;
            std::memcpy(y, ynew, sizeof(y));
        }
        h = hs * fac;
        if (h < 1e-12) return false;
    }
    return true;
}

static double evaluate(double k_growth, double k_div_mean, double cv_kdiv,
                       double sd, int initial_cells, int max_cells,
                       const Obs& obs, std::mt19937_64& rng) {
    std::normal_distribution<double> nd(0.0, 1.0);
    double t_end = obs.times.back() + 0.5;  // trailing_simulation_time
    std::vector<double> mass_sum(obs.times.size(), 0.0);
    std::vector<int> mass_cnt(obs.times.size(), 0);
    std::vector<Cell> queue;
    int n_cells = initial_cells;
    for (int i = 0; i < initial_cells; i++) {
        Cell c;
        c.t0 = 0.0;
        c.y[0] = 1.0; c.y[1] = 0.0; c.y[2] = 0.0; c.y[3] = 0.0;
        queue.push_back(c);
    }
    // work queue grows as cells divide (Experiment.cpp:691-779)
    for (size_t qi = 0; qi < queue.size(); qi++) {
        CellParams p;
        p.k_growth = k_growth;
        // per-cell multiplicative-log variability on the division clock
        // (VariabilityDescription; Sobol in the reference, pseudo here —
        // identical arithmetic per draw)
        p.k_div = k_div_mean * std::exp(cv_kdiv * nd(rng));
        if (!simulate_cell(p, queue[qi], t_end, 1e-6, 1e-6, obs, mass_sum,
                           mass_cnt, queue, max_cells, &n_cells))
            return -INFINITY;
    }
    // population-average time course, normal error model
    double logp = 0.0;
    for (size_t i = 0; i < obs.times.size(); i++) {
        if (!mass_cnt[i]) return -INFINITY;
        double avg = mass_sum[i] / mass_cnt[i];
        double z = (avg - obs.observed[i]) / sd;
        logp += -0.9189385332046727 - std::log(sd) - 0.5 * z * z;
    }
    return logp;
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: %s n_evals n_threads [max_cells] [initial]\n",
                     argv[0]);
        return 1;
    }
    int n_evals = std::atoi(argv[1]);
    int n_threads = std::atoi(argv[2]);
    int max_cells = argc > 3 ? std::atoi(argv[3]) : 128;
    int initial_cells = argc > 4 ? std::atoi(argv[4]) : 16;

    // same synthetic data as tools/bench_cellpop.py
    Obs obs;
    double k_growth_true = 0.1;
    for (int i = 0; i < 12; i++) {
        double t = 0.5 + (10.0 - 0.5) * i / 11.0;
        obs.times.push_back(t);
        obs.observed.push_back(std::exp(k_growth_true * 0.6 * t));
    }

    std::atomic<long> done(0);
    std::atomic<long> finite(0);
    double sink = 0.0;
    auto worker = [&](int tid) {
        std::mt19937_64 rng(99 + tid);
        std::uniform_real_distribution<double> u(-0.5, 0.5);
        double local = 0.0;
        while (done.fetch_add(1) < n_evals) {
            // fresh parameter draw each eval (like a proposal)
            double kg = 0.1 * std::exp(0.05 * u(rng));
            double kd = 0.25 * std::exp(0.05 * u(rng));
            double cv = 0.15 * std::exp(0.05 * u(rng));
            double sd = 0.05 * std::exp(0.05 * u(rng));
            double lp = evaluate(kg, kd, cv, sd, initial_cells, max_cells, obs, rng);
            if (std::isfinite(lp)) finite.fetch_add(1);
            local += std::isfinite(lp) ? lp : 0.0;
        }
        sink += local;
    };

    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; i++) threads.emplace_back(worker, i);
    for (auto& th : threads) th.join();
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                    .count();
    std::printf(
        "{\"cellpop_evals_per_sec\": %.2f, \"elapsed\": %.3f, \"finite\": %ld, "
        "\"max_cells\": %d, \"initial_cells\": %d, \"threads\": %d, \"sink\": %g}\n",
        n_evals / el, el, (long)finite.load(), max_cells, initial_cells,
        n_threads, sink);
    return 0;
}
