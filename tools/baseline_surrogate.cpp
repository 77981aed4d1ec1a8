// CPU baseline surrogate for the reference BCM3 PopPK likelihood.
//
// The reference (NKI-CCB/bcm3) cannot be built in this image (its Boost
// dependency is absent), so this tool measures an equivalent CPU
// implementation of the same work the reference performs per likelihood
// evaluation (reference: src/likelihoods/LikelihoodPopPKTrajectory.cpp:
// per-patient adaptive ODE integration with dosing discontinuities +
// Student-t(4) residuals; solver: the reference's own explicit adaptive
// Dormand-Prince RK5(4), src/odecommon/ODESolverDP5.cpp, at the same
// tolerances rel=1e-6 / abs=min_dose*1e-6 that the reference configures,
// LikelihoodPopPKTrajectory.cpp:241).
//
// Like the reference, evaluations are serial over patients within a
// thread and parallel over chains across threads (TaskManager,
// src/utils/TaskManager.h). Usage:
//   baseline_surrogate <datafile> <num_evals> <num_threads>
// The datafile is a plain text dump produced by tools/measure_baseline.py.
// Prints evals/sec.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <random>
#include <thread>
#include <vector>

struct Trial {
    int P, T;
    std::vector<double> time;                  // T
    std::vector<double> observed;              // P*T (NaN = missing)
    std::vector<double> dose;                  // P
    std::vector<double> dosing_interval;       // P
    std::vector<int> skipped;                  // P*29
};

struct Params {
    double ka, ke, kel, sd, sd2, conversion;
    // transit model (reference CalculateDerivative_OneCompartmentTransit,
    // LikelihoodPopPKTrajectory.cpp:573-592): Erlang-shaped inflow from the
    // most recent dose; 0 transit compartments integrated explicitly.
    bool transit = false;
    double n_transit = 0, k_transit = 0, dose_amt = 0, last_treatment = 0;
};

static const double C5[7] = {35.0/384, 0.0, 500.0/1113, 125.0/192, -2187.0/6784, 11.0/84, 0.0};
static const double C4[7] = {5179.0/57600, 0.0, 7571.0/16695, 393.0/640, -92097.0/339200, 187.0/2100, 1.0/40};
static const double AC[7][6] = {
    {0,0,0,0,0,0},
    {1.0/5,0,0,0,0,0},
    {3.0/40,9.0/40,0,0,0,0},
    {44.0/45,-56.0/15,32.0/9,0,0,0},
    {19372.0/6561,-25360.0/2187,64448.0/6561,-212.0/729,0,0},
    {9017.0/3168,-355.0/33,46732.0/5247,49.0/176,-5103.0/18656,0},
    {35.0/384,0,500.0/1113,125.0/192,-2187.0/6784,11.0/84}};

static inline void deriv(const Params& p, double t, const double* y, double* dydt) {
    if (p.transit) {
        double ts = t - p.last_treatment;
        double lognfac = 0.9189385332046727 + (p.n_transit + 0.5) * std::log(p.n_transit)
                         - p.n_transit + std::log(1 + 1 / (12.0 * p.n_transit));
        double transit = std::exp(p.n_transit * std::log(p.k_transit * ts)
                                  - p.k_transit * ts - lognfac);
        dydt[0] = p.k_transit * transit * p.dose_amt - (p.ka + p.ke) * y[0];
    } else {
        dydt[0] = -(p.ka + p.ke) * y[0];
    }
    dydt[1] = p.ka * y[0] - p.kel * y[1];
}

// Adaptive DP5 from t0 to t1 (same controller constants as the reference DP5)
static bool integrate(const Params& p, double* y, double t0, double t1,
                      double rtol, double atol, double& dt) {
    double t = t0;
    int steps = 0;
    while (t < t1) {
        if (++steps > 100000) return false;
        double h = dt < (t1 - t) ? dt : (t1 - t);
        static const double CNODE[7] = {0, 1.0/5, 3.0/10, 4.0/5, 8.0/9, 1.0, 1.0};
        double k[7][2], ytmp[2];
        deriv(p, t, y, k[0]);
        for (int i = 1; i < 7; i++) {
            ytmp[0] = y[0]; ytmp[1] = y[1];
            for (int j = 0; j < i; j++) {
                ytmp[0] += h * AC[i][j] * k[j][0];
                ytmp[1] += h * AC[i][j] * k[j][1];
            }
            deriv(p, t + CNODE[i] * h, ytmp, k[i]);
        }
        double y5[2] = {y[0], y[1]}, y4[2] = {y[0], y[1]};
        for (int i = 0; i < 7; i++) {
            y5[0] += h * C5[i] * k[i][0]; y5[1] += h * C5[i] * k[i][1];
            y4[0] += h * C4[i] * k[i][0]; y4[1] += h * C4[i] * k[i][1];
        }
        double errn = 0;
        for (int i = 0; i < 2; i++) {
            double sc = atol + rtol * std::max(std::fabs(y[i]), std::fabs(y5[i]));
            double e = (y5[i] - y4[i]) / sc;
            errn += e * e;
        }
        errn = std::sqrt(errn / 2.0);
        double fac = 0.9 * std::pow(errn + 1e-30, -0.2);
        fac = fac < 0.2 ? 0.2 : (fac > 10.0 ? 10.0 : fac);
        if (errn <= 1.0) {
            t += h;
            y[0] = y5[0]; y[1] = y5[1];
        }
        dt = h * fac;
        if (!std::isfinite(y[0]) || !std::isfinite(y[1])) return false;
    }
    return true;
}

static double evaluate(const Trial& tr, const Params* pp) {
    double logp = 0.0;
    for (int j = 0; j < tr.P; j++) {
        Params p = pp[j];
        // transit: dose enters through the Erlang inflow (y starts empty,
        // last_treatment tracks the most recent given dose); otherwise the
        // dose is a bolus into the absorption compartment.
        double y[2] = {p.transit ? 0.0 : tr.dose[j], 0.0};
        p.dose_amt = tr.dose[j];
        p.last_treatment = 0.0;
        double dt = 0.01;
        double t_cur = 0.0;
        int next_dose_k = 1;
        double rtol = 1e-6, atol = tr.dose[j] * 1e-6;
        for (int i = 0; i < tr.T; i++) {
            double t_obs = tr.time[i];
            // integrate across any dose events before this observation
            while (next_dose_k * tr.dosing_interval[j] <= t_obs + 1e-12) {
                double t_dose = next_dose_k * tr.dosing_interval[j];
                if (!integrate(p, y, t_cur, t_dose, rtol, atol, dt)) return -INFINITY;
                int day = (int)std::floor(t_dose / 24.0);
                bool give = !(day >= 0 && day < 29 && tr.skipped[j * 29 + day]);
                if (give) {
                    if (p.transit) p.last_treatment = t_dose;
                    else y[0] += tr.dose[j];
                }
                t_cur = t_dose;
                next_dose_k++;
            }
            if (!integrate(p, y, t_cur, t_obs, rtol, atol, dt)) return -INFINITY;
            t_cur = t_obs;
            double obs = tr.observed[j * tr.T + i];
            if (!std::isnan(obs)) {
                double x = y[1] * p.conversion;
                double sd = p.sd + p.sd2 * std::max(x, 0.0);
                double xn = (x - obs) / sd;
                logp += -0.9808292530117262 - 2.5 * std::log1p(0.25 * xn * xn) - std::log(sd);
            }
        }
    }
    return logp;
}

int main(int argc, char** argv) {
    if (argc < 4) { std::fprintf(stderr, "usage: %s data n_evals n_threads [one|one_transit]\n", argv[0]); return 1; }
    std::ifstream in(argv[1]);
    Trial tr;
    in >> tr.P >> tr.T;
    tr.time.resize(tr.T);
    for (auto& v : tr.time) in >> v;
    tr.observed.resize(tr.P * tr.T);
    for (auto& v : tr.observed) { std::string s; in >> s; v = (s == "nan") ? NAN : std::atof(s.c_str()); }
    tr.dose.resize(tr.P);
    for (auto& v : tr.dose) in >> v;
    tr.dosing_interval.resize(tr.P);
    for (auto& v : tr.dosing_interval) in >> v;
    tr.skipped.resize(tr.P * 29);
    for (auto& v : tr.skipped) in >> v;

    int n_evals = std::atoi(argv[2]);
    int n_threads = std::atoi(argv[3]);
    bool transit = (argc > 4 && std::string(argv[4]) == "one_transit");

    std::atomic<long> done(0);
    double sink = 0.0;
    auto worker = [&](int tid) {
        std::mt19937_64 rng(1234 + tid);
        std::uniform_real_distribution<double> u(0.0, 1.0);
        std::vector<Params> pp(tr.P);
        double local = 0.0;
        while (done.fetch_add(1) < n_evals) {
            // fresh parameter draw each eval (like a proposal)
            double mu_abs = -0.3 + 0.1 * (u(rng) - 0.5);
            double mu_elim = 0.3 + 0.1 * (u(rng) - 0.5);
            double vod = 120.0 * (0.9 + 0.2 * u(rng));
            for (int j = 0; j < tr.P; j++) {
                pp[j].ka = std::pow(10.0, mu_abs + 0.2 * (u(rng) - 0.5));
                pp[j].ke = 0.03;
                pp[j].kel = std::pow(10.0, mu_elim + 0.15 * (u(rng) - 0.5)) / vod;
                pp[j].sd = 20.0; pp[j].sd2 = 0.08;
                pp[j].conversion = (1e6 / 581.06) / vod;
                pp[j].transit = transit;
                pp[j].n_transit = 3.0 + u(rng);
                pp[j].k_transit = (pp[j].n_transit + 1.0) / (2.0 + u(rng));
            }
            local += evaluate(tr, pp.data());
        }
        sink += local;  // prevent optimizing away
    };

    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; i++) threads.emplace_back(worker, i);
    for (auto& t : threads) t.join();
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    std::printf("{\"evals_per_sec\": %.1f, \"elapsed\": %.3f, \"sink\": %g}\n",
                n_evals / el, el, sink);
    return 0;
}
