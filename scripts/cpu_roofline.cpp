// Per-core CPU roofline microbenchmark for the FVENS CPU-baseline bound.
//
// Measures, on ONE core of this host:
//   - sustained streaming bandwidth (STREAM-triad, working set >> LLC)
//   - sustained f64 FMA throughput (register-blocked unrolled FMA chain)
//
// scripts/cpu_bound.py multiplies these by a generous single-socket core
// count to build an UPPER bound on what a single-socket OpenMP FVENS
// (ILU0+FGMRES, SURVEY.md sec 6) could achieve, since the real solver is
// bound by these same two ceilings. Build:
//   g++ -O3 -march=native -funroll-loops scripts/cpu_roofline.cpp -o /tmp/roofline
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using clk = std::chrono::steady_clock;

static double secs(clk::time_point a, clk::time_point b) {
    return std::chrono::duration<double>(b - a).count();
}

// STREAM triad a = b + s*c over n doubles, reps times.
static double triad_gbs(size_t n, int reps) {
    std::vector<double> a(n, 1.0), b(n, 2.0), c(n, 3.0);
    double s = 1.000001;
    // warm
    for (size_t i = 0; i < n; ++i) a[i] = b[i] + s * c[i];
    auto t0 = clk::now();
    for (int r = 0; r < reps; ++r) {
        for (size_t i = 0; i < n; ++i) a[i] = b[i] + s * c[i];
        s += 1e-9;          // defeat loop-invariant motion across reps
    }
    auto t1 = clk::now();
    if (a[n / 2] == 42.0) printf("#");     // defeat DCE
    double bytes = double(reps) * n * 3 * sizeof(double);
    return bytes / secs(t0, t1) / 1e9;
}

// Register-resident FMA chains: 16 independent accumulators.
static double fma_gflops(long iters) {
    double acc[16];
    for (int i = 0; i < 16; ++i) acc[i] = 1.0 + i * 1e-3;
    double x = 1.0000001, y = 0.9999999;
    auto t0 = clk::now();
    for (long it = 0; it < iters; ++it) {
        for (int i = 0; i < 16; ++i) acc[i] = acc[i] * x + y;
    }
    auto t1 = clk::now();
    double sum = 0;
    for (int i = 0; i < 16; ++i) sum += acc[i];
    if (sum == 42.0) printf("#");
    return double(iters) * 16 * 2 / secs(t0, t1) / 1e9;
}

int main(int argc, char** argv) {
    size_t n = 1 << 25;                    // 32M doubles = 256 MB/array
    if (argc > 1) n = strtoull(argv[1], nullptr, 10);
    double bw = triad_gbs(n, 4);
    double fl = fma_gflops(200000000L);
    printf("{\"triad_gbs_per_core\": %.3f, \"fma_gflops_per_core\": %.3f, "
           "\"array_mb\": %.0f}\n", bw, fl, n * sizeof(double) / 1e6);
    return 0;
}
