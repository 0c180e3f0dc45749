// Standalone single-core benchmark of the reference QUILT full-panel
// haploid Li & Stephens forward-backward, used to MEASURE the baseline
// denominator for bench.py (BASELINE.md: the reference publishes no
// absolute numbers, and R/Rcpp is not installed in this environment, so
// the reference kernel cannot be run directly).
//
// This reproduces the ALGORITHM and data layout of
// Rcpp_haploid_dosage_versus_refs (reference: QUILT/src/
// reference-single.cpp:2189-2413; forward loop structure :441-580):
//
//   - per-grid emission table eMatDH[nMaxDH+1][G] built once per pass from
//     the sample's 32 genotype likelihoods per grid against the bit-packed
//     distinct haplotypes (reference: Rcpp_build_eMatDH, :272-329)
//   - forward:  alpha_k <- (jump/K * sum_prev + stay * alpha_k) * e_k with
//     e_k looked up through the uint8 hapMatcher[k][g] index
//   - lazy normalization: rescale only when the running alpha sum leaves
//     a safe double range (reference: :521-537)
//   - backward: symmetric, fused with per-grid dosage accumulation through
//     per-distinct-hap gamma sums (gammaSum[dh] -> distinctHapsIE dot)
//
// It is an independent implementation written from the algorithm
// description (SURVEY.md section 3.5), compiled -O3 -march=native,
// single-threaded — the reference's execution model (one core per
// sample-haplotype, SURVEY section 1 "Parallelism model").
//
// Usage: fb_ref_bench [K] [nGrids] [nMaxDH] [reps]
// Prints one JSON line: {"cells_per_s": ..., "K":..., "nGrids":..., ...}

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <cmath>
#include <random>
#include <vector>

int main(int argc, char** argv) {
    int K = argc > 1 ? atoi(argv[1]) : 5120;
    int G = argc > 2 ? atoi(argv[2]) : 2048;
    int D = argc > 3 ? atoi(argv[3]) : 255;   // nMaxDH
    int reps = argc > 4 ? atoi(argv[4]) : 3;

    std::mt19937_64 rng(42);
    std::uniform_real_distribution<double> unif(0.05, 1.0);
    std::uniform_int_distribution<int> dh_dist(1, D);
    std::uniform_int_distribution<uint32_t> word_dist;

    // panel in the reference's compressed layout
    std::vector<uint8_t> hapMatcher((size_t)K * G);
    for (auto& v : hapMatcher) v = (uint8_t)dh_dist(rng);
    std::vector<uint32_t> distinctHapsB((size_t)(D + 1) * G);
    for (auto& v : distinctHapsB) v = word_dist(rng);
    // sample GLs: [2][32] per grid
    std::vector<double> gl((size_t)2 * 32 * G);
    for (auto& v : gl) v = unif(rng);
    // transition rates per grid gap (stay, jump)
    std::vector<double> trans_stay(G, 0.99), trans_jump(G, 0.01);

    std::vector<double> eMatDH((size_t)(D + 1) * G);
    std::vector<double> alpha((size_t)K), beta((size_t)K);
    std::vector<double> alphaStore((size_t)K * G); // as the reference stores
    std::vector<double> gammaSum((size_t)(D + 1));
    std::vector<double> dosage((size_t)32 * G);
    const double ref_error = 1e-3;
    // distinctHapsIE precomputed once per region (reference:
    // quilt-prepare-reference.R:423), grid-major [G][D+1][32]
    std::vector<double> ie((size_t)G * (D + 1) * 32);
    for (int g = 0; g < G; ++g)
        for (int d = 1; d <= D; ++d) {
            uint32_t w = distinctHapsB[(size_t)d * G + g];
            for (int b = 0; b < 32; ++b) {
                double al = (w >> b) & 1u;
                ie[((size_t)g * (D + 1) + d) * 32 + b] =
                    al * (1.0 - ref_error) + (1.0 - al) * ref_error;
            }
        }

    double elapsed = 0.0;
    double sink = 0.0;
    for (int rep = 0; rep < reps; ++rep) {
        auto t0 = std::chrono::steady_clock::now();

        // ---- build eMatDH (per distinct hap x grid: product over 32 SNPs)
        for (int g = 0; g < G; ++g) {
            const double* glR = &gl[(size_t)0 * 32 * G + (size_t)g * 32];
            const double* glA = &gl[(size_t)1 * 32 * G + (size_t)g * 32];
            for (int d = 1; d <= D; ++d) {
                uint32_t w = distinctHapsB[(size_t)d * G + g];
                double e = 1.0;
                for (int b = 0; b < 32; ++b) {
                    double a = (w >> b) & 1u;
                    double p = a * (1.0 - ref_error) + (1.0 - a) * ref_error;
                    e *= glR[b] * (1.0 - p) + glA[b] * p;
                }
                eMatDH[(size_t)g * (D + 1) + d] = e;
            }
            eMatDH[(size_t)g * (D + 1)] = 0.0; // dh==0 escape (none generated here)
        }

        // ---- forward with lazy normalization
        double c = 1.0;           // running product of skipped normalizers
        double sum_prev = 0.0;
        for (int k = 0; k < K; ++k) {
            double e = eMatDH[hapMatcher[(size_t)0 * K + k]];
            alpha[k] = e / K;
            sum_prev += alpha[k];
        }
        memcpy(&alphaStore[0], alpha.data(), K * sizeof(double));
        for (int g = 1; g < G; ++g) {
            double jump = trans_jump[g] * sum_prev / K;
            double stay = trans_stay[g];
            double s = 0.0;
            const uint8_t* dh_col = &hapMatcher[(size_t)g * K];
            const double* e_g = &eMatDH[(size_t)g * (D + 1)];
            for (int k = 0; k < K; ++k) {
                double e = e_g[dh_col[k]];
                double a = (jump + stay * alpha[k]) * e;
                alpha[k] = a;
                s += a;
            }
            // lazy normalization (reference: reference-single.cpp:521-537)
            if (s < 1e-200) {
                double inv = 1.0 / s;
                for (int k = 0; k < K; ++k) alpha[k] *= inv;
                c *= s;
                s = 1.0;
            }
            sum_prev = s;
            memcpy(&alphaStore[(size_t)g * K], alpha.data(),
                   K * sizeof(double));
        }

        // ---- backward fused with dosage through gammaSum[dh]
        for (int k = 0; k < K; ++k) beta[k] = 1.0;
        double etb_sum = 0.0;
        for (int g = G - 1; g >= 0; --g) {
            // gamma at grid g; accumulate per-distinct-hap sums
            memset(gammaSum.data(), 0, (D + 1) * sizeof(double));
            const double* a_g = &alphaStore[(size_t)g * K];
            const uint8_t* dh_col = &hapMatcher[(size_t)g * K];
            double gs = 0.0;
            for (int k = 0; k < K; ++k) {
                double gam = a_g[k] * beta[k];
                gammaSum[dh_col[k]] += gam;
                gs += gam;
            }
            double inv_gs = gs > 0 ? 1.0 / gs : 0.0;
            // dosage for the grid's 32 SNPs through distinctHapsIE
            {
                double dos[32] = {0};
                const double* ie_g = &ie[(size_t)g * (D + 1) * 32];
                for (int d = 1; d <= D; ++d) {
                    double gsd = gammaSum[d];
                    const double* ie_d = &ie_g[(size_t)d * 32];
                    for (int b = 0; b < 32; ++b) dos[b] += gsd * ie_d[b];
                }
                for (int b = 0; b < 32; ++b)
                    dosage[(size_t)g * 32 + b] = dos[b] * inv_gs;
            }
            if (g == 0) break;
            // beta update g -> g-1
            double s = 0.0;
            const double* e_g = &eMatDH[(size_t)g * (D + 1)];
            for (int k = 0; k < K; ++k) {
                double e = e_g[dh_col[k]];
                double etb = e * beta[k];
                beta[k] = etb;       // temporarily e*beta
                s += etb;
            }
            double jump = trans_jump[g] * s / K;
            double stay = trans_stay[g];
            double mx = 0.0;
            for (int k = 0; k < K; ++k) {
                double b2 = stay * beta[k] + jump;
                beta[k] = b2;
                if (b2 > mx) mx = b2;
            }
            if (mx < 1e-200) {
                double inv = 1.0 / mx;
                for (int k = 0; k < K; ++k) beta[k] *= inv;
            }
            etb_sum = s;
        }
        (void)etb_sum;
        sink += dosage[0] + c;

        auto t1 = std::chrono::steady_clock::now();
        elapsed +=
            std::chrono::duration<double>(t1 - t0).count();
    }

    double cells = 2.0 * (double)K * (double)G * reps; // fwd + bwd
    printf(
        "{\"cells_per_s\": %.1f, \"K\": %d, \"nGrids\": %d, \"nMaxDH\": %d, "
        "\"reps\": %d, \"seconds_per_pass\": %.4f, \"sink\": %g}\n",
        cells / elapsed, K, G, D, reps, elapsed / reps, sink);
    return 0;
}
