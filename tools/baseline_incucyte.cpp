// CPU baseline surrogate for the reference's incucyte population
// likelihood (reference: src/likelihoods/LikelihoodIncucytePopulation.cpp
// via CVODESolverDelay). The reference cannot be built here (Boost
// absent); this tool performs the same per-evaluation work with the same
// algorithm class: per well (negative control, PAO positive control, and
// one well per drug concentration) a 3-state DELAY ODE — growing cells,
// apoptotic cells (with a removal term delayed by apoptosis_duration),
// debris — integrated by an adaptive embedded RK3(2) (Bogacki-Shampine)
// with cubic-Hermite history interpolation for the delayed term, at the
// reference's incucyte tolerances (rel 1e-6 / abs 1e-2,
// LikelihoodIncucytePopulation.cpp:131), then normal residuals on the
// derived confluence and apoptosis-marker time courses.
//
// Model structure matches bcm3_tpu/likelihoods/cellmisc.py
// IncucytePopulationLikelihood (drug ramp CalculateDrugEffect:414-425,
// contact inhibition :426-439): 5 wells, 20 timepoints over 96 h,
// 3 drug concentrations.
//
// Usage: baseline_incucyte <n_evals> <n_threads>
// Build: g++ -O3 -march=native -o baseline_incucyte \
//          tools/baseline_incucyte.cpp -lpthread

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

static const int NWELLS = 5;  // neg, pao, drug x3
static const int T = 20;
static const double T_END = 96.0;
static const double TREAT_TIME = 24.0;

struct WellParams {
    double prolif_eff;     // post-ramp proliferation target (nan -> base)
    double apo_eff;        // post-ramp apoptosis target (nan -> base)
    double start_t;        // ramp start (treatment + delay)
    double effect_t;       // ramp duration
    bool has_drug;
};

struct Params {
    double prolif, apo, apo_duration, remove;
    double cell_size, apoptotic_size, debris_size;
    double ci_start, ci_max;
    double sigma_confluence, sigma_marker;
    double y0[3];
    WellParams wells[NWELLS];
};

static inline void rhs(const Params& p, const WellParams& w, double t,
                       const double* y, double yd1, double* f) {
    double frac = 0.0;
    if (w.has_drug && t >= w.start_t) {
        frac = (t - w.start_t) / std::max(w.effect_t, 1e-12);
        frac = frac < 0 ? 0 : (frac > 1 ? 1 : frac);
    }
    double wp = std::isnan(w.prolif_eff) ? p.prolif : w.prolif_eff;
    double wa = std::isnan(w.apo_eff) ? p.apo : w.apo_eff;
    double p_eff = (1.0 - frac) * p.prolif + frac * wp;
    double a_eff = (1.0 - frac) * p.apo + frac * wa;
    double confl = 0.01 * (y[0] * p.cell_size + y[1] * p.apoptotic_size +
                           y[2] * p.debris_size);
    if (confl > p.ci_start) {
        double ci = (confl - p.ci_start) /
                    std::max(p.ci_max - p.ci_start, 1e-12);
        ci = ci < 0 ? 0 : (ci > 1 ? 1 : ci);
        p_eff *= (1.0 - ci);
    }
    f[0] = (p_eff - a_eff) * y[0];
    f[1] = a_eff * y[0] - p.remove * yd1;
    f[2] = p.remove * yd1;
}

// History record for the delayed term: (t, y1, f1) for cubic Hermite
struct Hist {
    std::vector<double> t, y1, f1;
};

static double hist_lookup(const Hist& h, const Params& p, double tq) {
    if (tq <= 0.0) return p.y0[1];
    // binary search for the bracketing interval
    size_t lo = 0, hi = h.t.size() - 1;
    if (tq >= h.t[hi]) return h.y1[hi];
    while (hi - lo > 1) {
        size_t mid = (lo + hi) / 2;
        if (h.t[mid] <= tq) lo = mid; else hi = mid;
    }
    double h01 = h.t[hi] - h.t[lo];
    if (h01 <= 0) return h.y1[lo];
    double s = (tq - h.t[lo]) / h01;
    double s2 = s * s, s3 = s2 * s;
    // cubic Hermite (the dense-output analogue of CVodeGetDky)
    return (2 * s3 - 3 * s2 + 1) * h.y1[lo] + (s3 - 2 * s2 + s) * h01 * h.f1[lo] +
           (-2 * s3 + 3 * s2) * h.y1[hi] + (s3 - s2) * h01 * h.f1[hi];
}

// Integrate one well with adaptive BS3(2), store y at obs times.
static bool solve_well(const Params& p, const WellParams& w,
                       const double* obs_t, double* out_y0, double* out_y1,
                       double* out_y2) {
    double y[3] = {p.y0[0], p.y0[1], p.y0[2]};
    double t = 0.0, h = 0.1;
    Hist hist;
    hist.t.reserve(512);
    double f0[3];
    {
        double yd1 = hist_lookup(hist, p, -p.apo_duration);
        rhs(p, w, 0.0, y, yd1, f0);
        hist.t.push_back(0.0);
        hist.y1.push_back(y[1]);
        hist.f1.push_back(f0[1]);
    }
    int oi = 0;
    int steps = 0;
    while (t < T_END) {
        if (++steps > 100000) return false;
        double hs = std::min(h, T_END - t);
        // BS3(2) stages (FSAL): k1 = f(t, y)
        double k1[3], k2[3], k3[3], k4[3], yt[3];
        std::memcpy(k1, f0, sizeof(k1));
        for (int i = 0; i < 3; i++) yt[i] = y[i] + 0.5 * hs * k1[i];
        rhs(p, w, t + 0.5 * hs,
            yt, hist_lookup(hist, p, t + 0.5 * hs - p.apo_duration), k2);
        for (int i = 0; i < 3; i++) yt[i] = y[i] + 0.75 * hs * k2[i];
        rhs(p, w, t + 0.75 * hs,
            yt, hist_lookup(hist, p, t + 0.75 * hs - p.apo_duration), k3);
        double ynew[3];
        for (int i = 0; i < 3; i++)
            ynew[i] = y[i] + hs * (2.0 / 9.0 * k1[i] + 1.0 / 3.0 * k2[i] +
                                   4.0 / 9.0 * k3[i]);
        rhs(p, w, t + hs, ynew,
            hist_lookup(hist, p, t + hs - p.apo_duration), k4);
        // embedded 2nd-order error
        double err = 0;
        for (int i = 0; i < 3; i++) {
            double y2 = y[i] + hs * (7.0 / 24.0 * k1[i] + 0.25 * k2[i] +
                                     1.0 / 3.0 * k3[i] + 0.125 * k4[i]);
            double sc = 1e-2 + 1e-6 * std::max(std::fabs(y[i]),
                                               std::fabs(ynew[i]));
            double e = (ynew[i] - y2) / sc;
            err += e * e;
        }
        err = std::sqrt(err / 3.0);
        if (!std::isfinite(err)) return false;
        double fac = 0.9 * std::pow(err + 1e-30, -1.0 / 3.0);
        fac = fac < 0.2 ? 0.2 : (fac > 6.0 ? 6.0 : fac);
        if (err <= 1.0) {
            double tnew = t + hs;
            while (oi < T && obs_t[oi] <= tnew) {
                double wgt = (obs_t[oi] - t) / hs;
                out_y0[oi] = (1 - wgt) * y[0] + wgt * ynew[0];
                out_y1[oi] = (1 - wgt) * y[1] + wgt * ynew[1];
                out_y2[oi] = (1 - wgt) * y[2] + wgt * ynew[2];
                oi++;
            }
            t = tnew;
            std::memcpy(y, ynew, sizeof(y));
            std::memcpy(f0, k4, sizeof(f0));  // FSAL
            hist.t.push_back(t);
            hist.y1.push_back(y[1]);
            hist.f1.push_back(f0[1]);
        }
        h = hs * fac;
        if (h < 1e-10) return false;
    }
    return true;
}

static double evaluate(const Params& p, const double* obs_t,
                       const double obs_confl[NWELLS][T],
                       const double obs_marker[NWELLS][T]) {
    static const double LSQRT2PI = 0.9189385332046727;
    double logp = 0.0;
    double y0v[T], y1v[T], y2v[T];
    for (int wix = 0; wix < NWELLS; wix++) {
        if (!solve_well(p, p.wells[wix], obs_t, y0v, y1v, y2v))
            return -INFINITY;
        for (int t = 0; t < T; t++) {
            double confl = 0.01 * (y0v[t] * p.cell_size +
                                   y1v[t] * p.apoptotic_size +
                                   y2v[t] * p.debris_size);
            double marker = y1v[t] * 0.8 + y2v[t] * 0.3;
            double zc = (confl - obs_confl[wix][t]) / p.sigma_confluence;
            double zm = (marker - obs_marker[wix][t]) / p.sigma_marker;
            logp += -LSQRT2PI - std::log(p.sigma_confluence) - 0.5 * zc * zc;
            logp += -LSQRT2PI - std::log(p.sigma_marker) - 0.5 * zm * zm;
        }
    }
    return logp;
}

int main(int argc, char** argv) {
    int n_evals = argc > 1 ? atoi(argv[1]) : 2000;
    int n_threads = argc > 2 ? atoi(argv[2]) : 2;

    double obs_t[T];
    for (int t = 0; t < T; t++) obs_t[t] = T_END * t / (T - 1.0);
    double obs_confl[NWELLS][T], obs_marker[NWELLS][T];
    for (int w = 0; w < NWELLS; w++)
        for (int t = 0; t < T; t++) {
            obs_confl[w][t] = 10.0;
            obs_marker[w][t] = 1.0;
        }

    std::atomic<long> done(0);
    double sink = 0.0;
    auto worker = [&](int tid) {
        std::mt19937_64 rng(13 + tid);
        std::uniform_real_distribution<double> u(-0.5, 0.5);
        double local = 0.0;
        while (done.fetch_add(1) < n_evals) {
            Params p;
            p.prolif = 0.03 * std::exp(0.05 * u(rng));
            p.apo = 0.1 * p.prolif;
            p.apo_duration = 6.0 * std::exp(0.05 * u(rng));
            p.remove = 0.05 * std::exp(0.05 * u(rng));
            p.cell_size = 300.0 * 9.174312e-6;
            p.apoptotic_size = 0.5 * p.cell_size;
            p.debris_size = 0.2 * p.cell_size;
            p.ci_start = 70.0;
            p.ci_max = 100.0;
            p.sigma_confluence = 2.0;
            p.sigma_marker = 0.5;
            double n0 = 1000.0;
            p.y0[0] = n0 * 0.98;
            p.y0[1] = n0 * 0.02;
            p.y0[2] = 0.0;
            double drug_p[3] = {0.1, 0.2, 0.3};
            double drug_a[3] = {0.001, 0.002, 0.005};
            for (int w = 0; w < NWELLS; w++) {
                WellParams& wp = p.wells[w];
                wp.start_t = TREAT_TIME + 1.0;
                wp.effect_t = 6.0;
                wp.has_drug = (w != 0);
                if (w == 0) {  // negative control: base rates
                    wp.prolif_eff = NAN;
                    wp.apo_eff = NAN;
                } else if (w == 1) {  // PAO positive control
                    wp.prolif_eff = 0.0;
                    wp.apo_eff = 0.2;
                    wp.effect_t = 3.0;
                } else {  // drug wells: cumulative-subtraction rates
                    double rel = 1.0;
                    double cum = p.apo;
                    for (int ci = 2; ci >= w - 2; ci--) {
                        rel = std::max(rel - drug_p[ci], 0.0);
                        cum += drug_a[ci];
                    }
                    wp.prolif_eff = rel * p.prolif;
                    wp.apo_eff = cum;
                }
            }
            local += evaluate(p, obs_t, obs_confl, obs_marker);
        }
        sink += local;
    };

    auto t0 = std::chrono::steady_clock::now();
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; i++) threads.emplace_back(worker, i);
    for (auto& th : threads) th.join();
    double el =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
    std::printf(
        "{\"incucyte_evals_per_sec\": %.2f, \"elapsed\": %.3f, "
        "\"wells\": %d, \"timepoints\": %d, \"threads\": %d, \"sink\": %g}\n",
        n_evals / el, el, NWELLS, T, n_threads, sink);
    return 0;
}
