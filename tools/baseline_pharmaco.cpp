// CPU baseline surrogate for the reference's pharmaco population
// likelihood (reference: src/pharmaco/PharmacoLikelihoodPopulation.cpp,
// PharmacokineticModel.cpp). The reference cannot be built here (Boost
// absent); this tool performs the same per-evaluation work with the same
// algorithm choice the reference makes — linear-compartment PK solved by
// MATRIX EXPONENTIALS over dosing intervals (PharmacokineticModel.cpp:146
// uses Eigen's unsupported MatrixFunctions exp(); here a hand-rolled
// Pade-6 scaling-and-squaring for the small system matrix):
//
//   per evaluation, per patient:
//     - build the n x n system matrix from absorption/clearance/volume
//       (ConstructMatrix:188-246), with the per-patient non-centered
//       10^(mu + sigma*Phi^-1(u)) random-effect transform
//       (SetupSimulation:259-292);
//     - one expm(A * dosing_interval), then a scan over K dose events;
//     - one expm(A * offset) read-out per observation time;
//     - Student-t(nu=4) residuals with additive error.
//
// Shapes match bench.py bench_pharmaco: 16 patients, 14 daily doses,
// 24 observations, 2 compartments (no peripheral/transit/metabolite).
//
// Usage: baseline_pharmaco <n_evals> <n_threads>
// Prints one JSON line with evals/sec.
//
// Build: g++ -O3 -march=native -o baseline_pharmaco \
//          tools/baseline_pharmaco.cpp -lpthread

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

static const int N = 2;        // compartments (gut, central)
static const int P = 16;       // patients
static const int T = 24;       // observations per patient
static const int K = 14;       // daily doses (14-day horizon)
static const double INTERVAL = 24.0;

// ---- small dense matrix helpers (n = N) ------------------------------------
typedef double Mat[N][N];

static void mat_mul(const Mat a, const Mat b, Mat c) {
    Mat t;
    for (int i = 0; i < N; i++)
        for (int j = 0; j < N; j++) {
            double s = 0;
            for (int k = 0; k < N; k++) s += a[i][k] * b[k][j];
            t[i][j] = s;
        }
    std::memcpy(c, t, sizeof(Mat));
}

static void mat_vec(const Mat a, const double* x, double* y) {
    double t[N];
    for (int i = 0; i < N; i++) {
        double s = 0;
        for (int k = 0; k < N; k++) s += a[i][k] * x[k];
        t[i] = s;
    }
    std::memcpy(y, t, sizeof(t));
}

static bool mat_solve(Mat a, Mat b) {  // b <- a^-1 b (partial pivot)
    int piv[N];
    for (int k = 0; k < N; k++) {
        int p = k;
        for (int i = k + 1; i < N; i++)
            if (std::fabs(a[i][k]) > std::fabs(a[p][k])) p = i;
        piv[k] = p;
        if (p != k) {
            for (int j = 0; j < N; j++) std::swap(a[k][j], a[p][j]);
            for (int j = 0; j < N; j++) std::swap(b[k][j], b[p][j]);
        }
        if (a[k][k] == 0.0) return false;
        for (int i = k + 1; i < N; i++) {
            double f = a[i][k] / a[k][k];
            for (int j = k; j < N; j++) a[i][j] -= f * a[k][j];
            for (int j = 0; j < N; j++) b[i][j] -= f * b[k][j];
        }
    }
    for (int i = N - 1; i >= 0; i--) {
        for (int j = 0; j < N; j++) {
            double s = b[i][j];
            for (int k = i + 1; k < N; k++) s -= a[i][k] * b[k][j];
            b[i][j] = s / a[i][i];
        }
    }
    return true;
}

// Pade-6 scaling-and-squaring expm (Higham; the same family Eigen's
// MatrixFunctions uses for the reference's PK matrices).
static void expm(const Mat A, Mat E) {
    double norm = 0;
    for (int i = 0; i < N; i++) {
        double r = 0;
        for (int j = 0; j < N; j++) r += std::fabs(A[i][j]);
        norm = std::max(norm, r);
    }
    int s = 0;
    if (norm > 0.5) s = std::max(0, (int)std::ceil(std::log2(norm / 0.5)));
    double scale = std::ldexp(1.0, -s);
    Mat As;
    for (int i = 0; i < N; i++)
        for (int j = 0; j < N; j++) As[i][j] = A[i][j] * scale;

    static const double c[7] = {1.0, 0.5, 3.0 / 26.0, 5.0 / 312.0,
                                5.0 / 3432.0, 1.0 / 11440.0, 1.0 / 308880.0};
    Mat A2, A4, A6, U, V, p, q;
    mat_mul(As, As, A2);
    mat_mul(A2, A2, A4);
    mat_mul(A4, A2, A6);
    // U = As*(c1 I + c3 A2 + c5 A4), V = c0 I + c2 A2 + c4 A4 + c6 A6
    Mat W;
    for (int i = 0; i < N; i++)
        for (int j = 0; j < N; j++) {
            W[i][j] = c[1] * (i == j) + c[3] * A2[i][j] + c[5] * A4[i][j];
            V[i][j] = c[0] * (i == j) + c[2] * A2[i][j] + c[4] * A4[i][j] +
                      c[6] * A6[i][j];
        }
    mat_mul(As, W, U);
    for (int i = 0; i < N; i++)
        for (int j = 0; j < N; j++) {
            p[i][j] = V[i][j] + U[i][j];
            q[i][j] = V[i][j] - U[i][j];
        }
    mat_solve(q, p);  // p <- q^-1 p
    std::memcpy(E, p, sizeof(Mat));
    for (int k = 0; k < s; k++) mat_mul(E, E, E);
}

// ---- model -----------------------------------------------------------------

// inverse normal CDF (Acklam's rational approximation; the role of
// ndtri in the non-centered per-patient transform)
static double ndtri(double p) {
    static const double a[] = {-3.969683028665376e+01, 2.209460984245205e+02,
                               -2.759285104469687e+02, 1.383577518672690e+02,
                               -3.066479806614716e+01, 2.506628277459239e+00};
    static const double b[] = {-5.447609879822406e+01, 1.615858368580409e+02,
                               -1.556989798598866e+02, 6.680131188771972e+01,
                               -1.328068155288572e+01};
    static const double cc[] = {-7.784894002430293e-03, -3.223964580411365e-01,
                                -2.400758277161838e+00, -2.549732539343734e+00,
                                4.374664141464968e+00,  2.938163982698783e+00};
    static const double d[] = {7.784695709041462e-03, 3.224671290700398e-01,
                               2.445134137142996e+00, 3.754408661907416e+00};
    const double pl = 0.02425;
    if (p < pl) {
        double q = std::sqrt(-2 * std::log(p));
        return (((((cc[0] * q + cc[1]) * q + cc[2]) * q + cc[3]) * q + cc[4]) *
                    q + cc[5]) /
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1);
    }
    if (p > 1 - pl) return -ndtri(1 - p);
    double q = p - 0.5, r = q * q;
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r +
            a[5]) * q /
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1);
}

// log pdf of Student-t nu=4 with scale sigma (poppk.py log_pdf_tnu4 /
// reference ProbabilityDistributions t4 fast path)
static double log_pdf_t4(double x, double mu, double sigma) {
    static const double LOGC = std::log(0.375);  // Gamma(5/2)/(Gamma(2) sqrt(4 pi)) = 3/8
    double z = (x - mu) / sigma;
    return LOGC - std::log(sigma) - 2.5 * std::log1p(z * z / 4.0);
}

struct Problem {
    double obs_time[T];
    double obs_value[P][T];
    double u_absorption[P];  // per-patient quantiles
    double dose[P];
};

static double evaluate(const Problem& pb, double mean_abs, double sigma_abs,
                       double mean_cl, double mean_vod, double add_sd) {
    double logp = 0.0;
    for (int j = 0; j < P; j++) {
        double ka = std::pow(10.0, mean_abs +
                                       sigma_abs * ndtri(pb.u_absorption[j]));
        double cl = std::pow(10.0, mean_cl);
        double vod = std::pow(10.0, mean_vod);
        double kel = cl / vod;
        Mat A = {{-ka, 0.0}, {ka, -kel}};
        Mat Astep;
        for (int i = 0; i < N; i++)
            for (int jj = 0; jj < N; jj++) Astep[i][jj] = A[i][jj] * INTERVAL;
        Mat M;
        expm(Astep, M);  // one step matrix per patient per evaluation
        // scan over dose events, storing interval-start states
        double ystart[K][N];
        double y[N] = {0.0, 0.0};
        for (int k = 0; k < K; k++) {
            y[0] += pb.dose[j];
            ystart[k][0] = y[0];
            ystart[k][1] = y[1];
            mat_vec(M, y, y);
        }
        const double conversion = (1e6 / 581.06) / vod;  // lapatinib MW
        for (int t = 0; t < T; t++) {
            double tt = pb.obs_time[t];
            int k = std::max(0, std::min(K - 1, (int)std::floor(
                                                    (tt - 1e-9) / INTERVAL)));
            double off = tt - k * INTERVAL;
            Mat Aoff, Eo;
            for (int i = 0; i < N; i++)
                for (int jj = 0; jj < N; jj++) Aoff[i][jj] = A[i][jj] * off;
            expm(Aoff, Eo);  // one expm read-out per observation
            double yo[N];
            mat_vec(Eo, ystart[k], yo);
            double x = yo[1] * conversion;
            logp += log_pdf_t4(x, pb.obs_value[j][t], add_sd);
        }
    }
    return logp;
}

int main(int argc, char** argv) {
    int n_evals = argc > 1 ? atoi(argv[1]) : 2000;
    int n_threads = argc > 2 ? atoi(argv[2]) : 2;

    Problem pb;
    // observation grid: dense day 1 then sparser (poppk_synth pattern)
    double day1[6] = {0.5, 1.0, 2.0, 4.0, 8.0, 12.0};
    for (int t = 0; t < 6; t++) pb.obs_time[t] = day1[t];
    for (int t = 6; t < T; t++)
        pb.obs_time[t] = 24.0 + (14 * 24.0 - 24.0) * (t - 6) / (T - 7);
    std::mt19937_64 rng(42);
    std::uniform_real_distribution<double> u01(0.05, 0.95);
    for (int j = 0; j < P; j++) {
        pb.u_absorption[j] = u01(rng);
        pb.dose[j] = 100.0 + 50.0 * (j % 3);
        for (int t = 0; t < T; t++)
            pb.obs_value[j][t] = 500.0 + 100.0 * u01(rng);
    }

    std::atomic<long> done(0);
    double sink = 0.0;
    auto worker = [&](int tid) {
        std::mt19937_64 prng(7 + tid);
        std::uniform_real_distribution<double> u(-0.5, 0.5);
        double local = 0.0;
        while (done.fetch_add(1) < n_evals) {
            // fresh parameter draw each eval (like a proposal)
            double ma = -0.3 + 0.05 * u(prng);
            double sa = 0.2 * std::exp(0.05 * u(prng));
            double mc = std::log10(18.0) + 0.05 * u(prng);
            double mv = std::log10(120.0) + 0.05 * u(prng);
            double sd = 25.0 * std::exp(0.05 * u(prng));
            local += evaluate(pb, ma, sa, mc, mv, sd);
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
        "{\"pharmaco_evals_per_sec\": %.2f, \"elapsed\": %.3f, "
        "\"patients\": %d, \"observations\": %d, \"doses\": %d, "
        "\"threads\": %d, \"sink\": %g}\n",
        n_evals / el, el, P, T, K, n_threads, sink);
    return 0;
}
