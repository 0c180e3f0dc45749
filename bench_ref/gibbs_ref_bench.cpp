// Standalone single-core benchmark of the reference QUILT per-read Gibbs
// sweep and of the whole-sample imputation loop, used to MEASURE the
// baseline denominators for BENCH_FULL.json (gibbs_resamples_per_s_core,
// samples_per_s_core). R/Rcpp is not installed in this environment, so
// the reference cannot be run directly (see PARITY_REPORT.md); this is an
// independent C++ implementation of the reference's algorithm and data
// layout, compiled -O3 -march=native, single-threaded — the reference's
// execution model (one core per sample, SURVEY.md section 1).
//
// What it reproduces (diploid, sample_is_diploid semantics):
//  - per-iteration grid sweep advancing 2 coupled haploid HMMs one grid
//    at a time (rcpp_gibbs_nipt_iterate, reference:
//    QUILT/src/gibbs-nipt.cpp:1756-1960, with the QUILT_faster alpha
//    step skipping emission work on read-free grids)
//  - per-read Gibbs resampling from alpha x beta read-removal
//    probabilities: ab = alpha % beta per hap, gain = sum_k ab_h * e_r,
//    loss = sum_k ab_hC / e_r, flip updates eMatGrid + alpha in place
//    (sample_reads_in_grid, gibbs-nipt.cpp:733-1341)
//  - full backward pass per iteration (Rcpp_run_backward_haploid_QUILT_
//    faster, gibbs-nipt.cpp:1925-1935)
//  - eMatRead_t construction per Gibbs call from the compressed panel
//    (Rcpp_make_eMatRead_t_for_gibbs_using_objects,
//    QUILT/src/gibbs-small.cpp:116-274, cost-representative form)
//  - END-TO-END mode: the reference per-sample loop shape
//    (get_and_impute_one_sample, QUILT/R/functions.R:3-1500):
//    (nGibbsSamples + 1 phasing) x n_seek_its x {eMatRead build +
//    n-sweep Gibbs call + full-panel haploid FB for each of 2 latent
//    haps (Rcpp_haploid_dosage_versus_refs, reference-single.cpp:
//    2189-2413, same inner loops as fb_ref_bench.cpp)}
//
// Conservative omissions (all of which COST the reference extra time in
// reality, so measured speedups vs this denominator are understated):
// block-Gibbs moves at iterations {3,6,9}, H_class bookkeeping,
// mspbwt/top-K haplotype selection between seek iterations, consensus
// and VCF construction.
//
// Usage: gibbs_ref_bench [mode=sweep|e2e] [Ksub] [G] [nReads] [n_its]
// Prints one JSON line.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <chrono>
#include <cmath>
#include <random>
#include <string>
#include <vector>

static std::mt19937_64 rng(42);

struct Workload {
    int Ksub, G, R, n_its;
    int J = 16;                        // SNPs per read
    std::vector<int> read_grid;        // sorted grid of each read [R]
    std::vector<int> grid_start;       // first read of each grid [G+1]
    std::vector<double> eMatRead;      // [R][Ksub] column-major per read
    std::vector<double> trans_stay, trans_jump;   // [G]
    std::vector<uint8_t> hapMatcher;   // [G][Ksub] (uint8 dh index)
    std::vector<double> base_e;        // [R][J] per-base emission factors
};

static Workload make_workload(int Ksub, int G, int R, int n_its) {
    Workload w;
    w.Ksub = Ksub; w.G = G; w.R = R; w.n_its = n_its;
    std::uniform_int_distribution<int> gdist(0, G - 1);
    w.read_grid.resize(R);
    for (int r = 0; r < R; ++r) w.read_grid[r] = gdist(rng);
    std::sort(w.read_grid.begin(), w.read_grid.end());
    w.grid_start.assign(G + 1, 0);
    for (int r = 0; r < R; ++r) w.grid_start[w.read_grid[r] + 1]++;
    for (int g = 0; g < G; ++g) w.grid_start[g + 1] += w.grid_start[g];
    w.trans_stay.assign(G, 0.99);
    w.trans_jump.assign(G, 0.01);
    std::uniform_int_distribution<int> dh(0, 254);
    w.hapMatcher.resize((size_t)G * Ksub);
    for (auto& v : w.hapMatcher) v = (uint8_t)dh(rng);
    std::uniform_real_distribution<double> be(0.3, 1.0);
    w.base_e.resize((size_t)R * w.J);
    for (auto& v : w.base_e) v = be(rng);
    w.eMatRead.assign((size_t)R * Ksub, 1.0);
    return w;
}

// eMatRead_t build: per read, per hap, product over the read's J SNPs of
// a per-base emission that depends on the hap's allele (looked up through
// the compressed hapMatcher index) — the loop shape and memory pattern of
// Rcpp_make_eMatRead_t_for_gibbs_using_objects (gibbs-small.cpp:116-274),
// with the reference's per-read rescale to max 1.
static void build_eMatRead(Workload& w) {
    const int K = w.Ksub, J = w.J;
    for (int r = 0; r < w.R; ++r) {
        double* col = &w.eMatRead[(size_t)r * K];
        const double* eb = &w.base_e[(size_t)r * J];
        const uint8_t* dh = &w.hapMatcher[(size_t)w.read_grid[r] * K];
        double mx = 0.0;
        for (int k = 0; k < K; ++k) {
            double e = 1.0;
            for (int j = 0; j < J; ++j) {
                // allele from the packed distinct-hap index
                double a = (double)((dh[k] >> (j & 7)) & 1);
                e *= a * eb[j] + (1.0 - a) * (1.0 - 0.7 * eb[j]);
            }
            col[k] = e;
            if (e > mx) mx = e;
        }
        double inv = mx > 0 ? 1.0 / mx : 1.0;
        for (int k = 0; k < K; ++k) {
            col[k] *= inv;
            if (col[k] < 1e-10) col[k] = 1e-10;
        }
    }
}

// One full Gibbs call: n_its iterations of {forward grid sweep with
// per-read resampling} + backward pass, NL latent haps (2 = diploid,
// 3 = NIPT triploid with label priors (0.5, (1-ff)/2, ff/2) — reference:
// rcpp_gibbs_nipt_initialize label draw + sample_reads_in_grid 3-way
// candidate weights, QUILT/src/gibbs-nipt.cpp:733-1341,1961-1978).
// Returns a sink value so nothing is optimized away.
static double gibbs_call(const Workload& w, std::vector<int>& H,
                         std::vector<double>& u, int NL = 2,
                         double ff = 0.0) {
    const int K = w.Ksub, G = w.G, R = w.R;
    std::vector<double> alpha((size_t)NL * K * G);
    std::vector<double> beta((size_t)NL * K * G);
    std::vector<double> emg((size_t)NL * K * G, 1.0);
    std::vector<double> c(NL * G, 1.0);
    std::vector<double> ab((size_t)NL * K);
    double prior[3] = {0.5, 0.5, 0.0};
    if (NL == 3) { prior[1] = (1.0 - ff) / 2; prior[2] = ff / 2; }
    double sink = 0.0;

    // initial eMatGrid from labels (rcpp init path)
    for (int r = 0; r < R; ++r) {
        int g = w.read_grid[r], h = H[r];
        double* col = &emg[((size_t)h * G + g) * K];
        const double* e = &w.eMatRead[(size_t)r * K];
        for (int k = 0; k < K; ++k) col[k] *= e[k];
    }

    size_t iu = 0;
    for (int it = 0; it < w.n_its; ++it) {
        // ---- forward sweep with in-grid resampling ----
        for (int h = 0; h < NL; ++h) {
            double* a0 = &alpha[((size_t)h * G) * K];
            const double* e0 = &emg[((size_t)h * G) * K];
            double s = 0.0;
            for (int k = 0; k < K; ++k) { a0[k] = e0[k] / K; s += a0[k]; }
            c[h * G] = 1.0 / s;
            for (int k = 0; k < K; ++k) a0[k] *= c[h * G];
        }
        for (int g = 0; g < G; ++g) {
            if (g > 0) {
                for (int h = 0; h < NL; ++h) {
                    const double* ap = &alpha[((size_t)h * G + g - 1) * K];
                    double* ag = &alpha[((size_t)h * G + g) * K];
                    const double* eg = &emg[((size_t)h * G + g) * K];
                    double stay = w.trans_stay[g], jump = w.trans_jump[g] / K;
                    bool has_read = w.grid_start[g + 1] > w.grid_start[g];
                    double s = 0.0;
                    if (has_read) {
                        for (int k = 0; k < K; ++k) {
                            double a = (stay * ap[k] + jump) * eg[k];
                            ag[k] = a; s += a;
                        }
                    } else {
                        // QUILT_faster: no emission work on read-free grids
                        for (int k = 0; k < K; ++k) {
                            double a = stay * ap[k] + jump;
                            ag[k] = a; s += a;
                        }
                    }
                    double ci = 1.0 / s;
                    c[h * G + g] = ci;
                    for (int k = 0; k < K; ++k) ag[k] *= ci;
                }
            }
            // ---- resample reads in this grid ----
            int r0 = w.grid_start[g], r1 = w.grid_start[g + 1];
            if (r0 == r1) continue;
            double pC[3];
            for (int h = 0; h < NL; ++h) {
                const double* ag = &alpha[((size_t)h * G + g) * K];
                const double* bg = &beta[((size_t)h * G + g) * K];
                double* abh = &ab[(size_t)h * K];
                double s = 0.0;
                for (int k = 0; k < K; ++k) {
                    double v = ag[k] * (it == 0 ? 1.0 : bg[k]);
                    abh[k] = v; s += v;
                }
                pC[h] = s;
            }
            for (int r = r0; r < r1; ++r) {
                const double* e = &w.eMatRead[(size_t)r * K];
                int hC = H[r];
                // candidate weights: w[n] = prior[n] * gain[n] * loss_C *
                // prod_{m != n, m != hC} pC[m]; w[hC] = prior[hC]*prod pC
                const double* abC = &ab[(size_t)hC * K];
                double loss = 0.0;
                for (int k = 0; k < K; ++k) loss += abC[k] / e[k];
                double wgt[3], tot = 0.0;
                for (int n = 0; n < NL; ++n) {
                    if (n == hC) {
                        double p = prior[n];
                        for (int m = 0; m < NL; ++m) p *= pC[m];
                        wgt[n] = p;
                    } else {
                        const double* abN = &ab[(size_t)n * K];
                        double gain = 0.0;
                        for (int k = 0; k < K; ++k) gain += abN[k] * e[k];
                        double p = prior[n] * gain * loss;
                        for (int m = 0; m < NL; ++m)
                            if (m != n && m != hC) p *= pC[m];
                        wgt[n] = p;
                    }
                    tot += wgt[n];
                }
                double chance = u[iu++ % u.size()] * tot;
                int hN = hC;
                if (tot > 0) {
                    double cum = 0.0;
                    for (int n = 0; n < NL; ++n) {
                        cum += wgt[n];
                        if (chance < cum) { hN = n; break; }
                    }
                }
                if (hN != hC) {
                    // flip: move the read's emission between the two haps
                    double* eC = &emg[((size_t)hC * G + g) * K];
                    double* eA = &emg[((size_t)hN * G + g) * K];
                    double* abCm = &ab[(size_t)hC * K];
                    double* abAm = &ab[(size_t)hN * K];
                    double sC = 0.0, sA = 0.0;
                    for (int k = 0; k < K; ++k) {
                        eC[k] /= e[k];
                        eA[k] *= e[k];
                        abCm[k] /= e[k];
                        abAm[k] *= e[k];
                        sC += abCm[k];
                        sA += abAm[k];
                    }
                    pC[hC] = sC; pC[hN] = sA;
                    sink += alpha[((size_t)hC * G + g) * K];
                    H[r] = hN;
                }
            }
        }
        // ---- backward pass (all haps) ----
        for (int h = 0; h < NL; ++h) {
            double* b = &beta[((size_t)h * G + (G - 1)) * K];
            for (int k = 0; k < K; ++k) b[k] = c[h * G + G - 1];
            for (int g = G - 2; g >= 0; --g) {
                const double* bn = &beta[((size_t)h * G + g + 1) * K];
                const double* en = &emg[((size_t)h * G + g + 1) * K];
                double* bg = &beta[((size_t)h * G + g) * K];
                double stay = w.trans_stay[g + 1];
                double jump = w.trans_jump[g + 1] / K;
                bool has_read = w.grid_start[g + 2 > G ? G : g + 2] >
                                w.grid_start[g + 1];
                double s = 0.0;
                if (has_read) {
                    for (int k = 0; k < K; ++k) {
                        double eb = en[k] * bn[k];
                        bg[k] = eb; s += eb;
                    }
                } else {
                    for (int k = 0; k < K; ++k) { bg[k] = bn[k]; s += bn[k]; }
                }
                double js = jump * s;
                double ci = c[h * G + g];
                for (int k = 0; k < K; ++k)
                    bg[k] = (stay * bg[k] + js) * ci;
            }
        }
        sink += alpha[(size_t)G * K - 1] + beta[0];
    }
    return sink;
}

// full-panel haploid FB pass (forward + backward + dosage), same inner
// loops as fb_ref_bench.cpp (reference: reference-single.cpp:2189-2413)
static double fb_full_pass(int K, int G, int D,
                           const std::vector<uint8_t>& hapMatcher,
                           const std::vector<double>& eMatDH) {
    std::vector<double> alpha(K), beta(K), alphaStore((size_t)K * G);
    double sink = 0.0;
    double sum_prev = 0.0;
    for (int k = 0; k < K; ++k) {
        double e = eMatDH[hapMatcher[k]];
        alpha[k] = e / K; sum_prev += alpha[k];
    }
    memcpy(&alphaStore[0], alpha.data(), K * sizeof(double));
    for (int g = 1; g < G; ++g) {
        double jump = 0.01 * sum_prev / K, stay = 0.99, s = 0.0;
        const uint8_t* dh = &hapMatcher[(size_t)g * K];
        const double* e_g = &eMatDH[(size_t)g * (D + 1)];
        for (int k = 0; k < K; ++k) {
            double a = (jump + stay * alpha[k]) * e_g[dh[k]];
            alpha[k] = a; s += a;
        }
        if (s < 1e-200) {
            double inv = 1.0 / s;
            for (int k = 0; k < K; ++k) alpha[k] *= inv;
            s = 1.0;
        }
        sum_prev = s;
        memcpy(&alphaStore[(size_t)g * K], alpha.data(), K * sizeof(double));
    }
    for (int k = 0; k < K; ++k) beta[k] = 1.0;
    for (int g = G - 1; g >= 1; --g) {
        const uint8_t* dh = &hapMatcher[(size_t)g * K];
        const double* e_g = &eMatDH[(size_t)g * (D + 1)];
        const double* a_g = &alphaStore[(size_t)g * K];
        double gs = 0.0, s = 0.0;
        for (int k = 0; k < K; ++k) gs += a_g[k] * beta[k];
        sink += gs;
        for (int k = 0; k < K; ++k) {
            double etb = e_g[dh[k]] * beta[k];
            beta[k] = etb; s += etb;
        }
        double jump = 0.01 * s / K, stay = 0.99, mx = 0.0;
        for (int k = 0; k < K; ++k) {
            double b2 = stay * beta[k] + jump;
            beta[k] = b2; if (b2 > mx) mx = b2;
        }
        if (mx < 1e-200) {
            double inv = 1.0 / mx;
            for (int k = 0; k < K; ++k) beta[k] *= inv;
        }
    }
    return sink;
}

int main(int argc, char** argv) {
    // usage: gibbs_ref_bench [mode] [Ksub] [G] [nReads] [n_its] [J] [K_panel]
    // modes: sweep | e2e   (diploid, NL=2)
    //        sweep3 | e2e3 (NIPT triploid, NL=3, ff=0.2 — reference
    //                       semantics gibbs-nipt.cpp:1961-1978)
    // J = SNPs per read (16 short-read default; ~100 for ONT-shaped
    //     long reads, reference README.md:28 high-error long reads)
    std::string mode = argc > 1 ? argv[1] : "sweep";
    int Ksub = argc > 2 ? atoi(argv[2]) : 600;
    int G = argc > 3 ? atoi(argv[3]) : 512;
    int R = argc > 4 ? atoi(argv[4]) : 1638;
    int n_its = argc > 5 ? atoi(argv[5]) : 21;
    int J = argc > 6 ? atoi(argv[6]) : 16;
    int K_panel_arg = argc > 7 ? atoi(argv[7]) : 5120;
    int NL = (mode == "sweep3" || mode == "e2e3") ? 3 : 2;
    double ff = NL == 3 ? 0.2 : 0.0;

    Workload w = make_workload(Ksub, G, R, n_its);
    w.J = J;
    if (J != 16) {
        std::uniform_real_distribution<double> be(0.3, 1.0);
        w.base_e.resize((size_t)R * J);
        for (auto& v : w.base_e) v = be(rng);
    }
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    std::vector<double> u(1 << 16);
    for (auto& v : u) v = unif(rng);
    std::vector<int> H(R);
    for (int r = 0; r < R; ++r) {
        if (NL == 2) H[r] = (int)(rng() & 1);
        else {
            double x = unif(rng);
            H[r] = x < 0.5 ? 0 : (x < 0.5 + (1 - ff) / 2 ? 1 : 2);
        }
    }
    double sink = 0.0;

    if (mode == "sweep" || mode == "sweep3") {
        // one 21-sweep Gibbs call incl. its eMatRead build, as the engine
        // issues it; 7 chains run SEQUENTIALLY on the reference's core
        build_eMatRead(w);
        std::vector<int> H0 = H;
        sink += gibbs_call(w, H0, u, NL, ff);  // warm caches
        int chains = 7, reps = 2;
        auto t0 = std::chrono::steady_clock::now();
        for (int rep = 0; rep < reps; ++rep)
            for (int ch = 0; ch < chains; ++ch) {
                std::vector<int> Hc = H;
                sink += gibbs_call(w, Hc, u, NL, ff);
            }
        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count() / reps;
        double resamples = (double)n_its * chains * R;
        printf("{\"mode\": \"%s\", \"gibbs_resamples_per_s_core\": %.1f, "
               "\"seconds_per_7_chain_call\": %.4f, \"Ksub\": %d, "
               "\"nGrids\": %d, \"nReads\": %d, \"n_its\": %d, "
               "\"n_latent\": %d, \"J\": %d, \"sink\": %g}\n",
               mode.c_str(), resamples / dt, dt, Ksub, G, R, n_its, NL, J,
               sink);
    } else {
        // whole-sample loop at the BENCH_FULL workload shape:
        // (7 Gibbs samples + 1 phasing) x 3 seek its x
        //   {eMatRead build + Gibbs call + NL full-panel FB passes}
        int K_panel = K_panel_arg, D = 255;
        std::uniform_int_distribution<int> dh_dist(1, D);
        std::vector<uint8_t> hm_full((size_t)G * K_panel);
        for (auto& v : hm_full) v = (uint8_t)dh_dist(rng);
        std::vector<double> eMatDH((size_t)G * (D + 1));
        for (auto& v : eMatDH) v = 0.2 + 0.8 * unif(rng);
        int outer = 8, seek = 3;
        auto t0 = std::chrono::steady_clock::now();
        for (int o = 0; o < outer; ++o) {
            for (int si = 0; si < seek; ++si) {
                build_eMatRead(w);
                std::vector<int> Hc = H;
                sink += gibbs_call(w, Hc, u, NL, ff);
                for (int h = 0; h < NL; ++h)
                    sink += fb_full_pass(K_panel, G, D, hm_full, eMatDH);
            }
        }
        auto t1 = std::chrono::steady_clock::now();
        double dt = std::chrono::duration<double>(t1 - t0).count();
        printf("{\"mode\": \"%s\", \"samples_per_s_core\": %.5f, "
               "\"seconds_per_sample\": %.2f, \"K_panel\": %d, "
               "\"Ksub\": %d, \"nGrids\": %d, \"nReads\": %d, "
               "\"n_latent\": %d, \"J\": %d, "
               "\"config\": \"8 chain-runs x 3 seek its x (%d-sweep Gibbs "
               "+ %d full-panel FB)\", \"sink\": %g}\n",
               mode.c_str(), 1.0 / dt, dt, K_panel, Ksub, G, R, NL, J,
               n_its, NL, sink);
    }
    return 0;
}
