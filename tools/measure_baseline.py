"""Measure the reference-equivalent single-core FB throughput on this host
and record it as the bench.py denominator.

Builds bench_ref/fb_ref_bench.cpp (an independent C++ implementation of the
reference's Rcpp_haploid_dosage_versus_refs algorithm and data layout —
see the header of that file) and runs it at the bench.py workload shape
(K=5120, nGrids=2048, nMaxDH=255) plus the Ksubset=600 shape. Writes
BASELINE_MEASURED.json at the repo root.

Why not run the reference itself: R/Rcpp and the STITCH/mspbwt packages are
not installed in this environment and cannot be installed (no network);
see PARITY_REPORT.md.

Usage: python tools/measure_baseline.py
"""
import json
import os
import platform
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "bench_ref", "fb_ref_bench.cpp")
BIN = os.path.join(ROOT, "bench_ref", "fb_ref_bench")
GSRC = os.path.join(ROOT, "bench_ref", "gibbs_ref_bench.cpp")
GBIN = os.path.join(ROOT, "bench_ref", "gibbs_ref_bench")
OUT = os.path.join(ROOT, "BASELINE_MEASURED.json")


def cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def main() -> int:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", BIN, SRC],
        check=True,
    )
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-o", GBIN, GSRC],
        check=True,
    )
    results = {}
    for name, args in {
        "full_panel_K5120": ["5120", "2048", "255", "3"],
        "subset_K600": ["600", "2048", "255", "5"],
    }.items():
        out = subprocess.run(
            [BIN] + args, check=True, capture_output=True, text=True
        ).stdout
        results[name] = json.loads(out)
    # per-read Gibbs sweep + whole-sample loop denominators at the
    # BENCH_FULL workload shape (bench_ref/gibbs_ref_bench.cpp; reference
    # loops: QUILT/src/gibbs-nipt.cpp:733-1341,1756-1960 and the
    # per-sample loop QUILT/R/functions.R:3-1500)
    for name, args in {
        "gibbs_sweep": ["sweep", "600", "512", "1638", "21"],
        "end_to_end": ["e2e", "600", "512", "1638", "21"],
    }.items():
        out = subprocess.run(
            [GBIN] + args, check=True, capture_output=True, text=True
        ).stdout
        results[name] = json.loads(out)
    doc = {
        "reference_cells_per_s": results["full_panel_K5120"]["cells_per_s"],
        "gibbs_resamples_per_s_core": results["gibbs_sweep"][
            "gibbs_resamples_per_s_core"],
        "samples_per_s_core": results["end_to_end"]["samples_per_s_core"],
        "methodology": (
            "independent single-core C++ (-O3 -march=native) implementations "
            "of the reference's full-panel FB (bench_ref/fb_ref_bench.cpp; "
            "reference: QUILT/src/reference-single.cpp:2189-2413), per-read "
            "Gibbs sweep and whole-sample loop (bench_ref/"
            "gibbs_ref_bench.cpp; reference: QUILT/src/gibbs-nipt.cpp:"
            "733-1341,1756-1960, QUILT/R/functions.R:3-1500) measured on "
            "this host, because R/Rcpp + STITCH/mspbwt are not installed "
            "and cannot be (no network). One cell update = one K-state "
            "alpha or beta update at one grid; fwd+bwd counted. The "
            "end-to-end loop omits block-Gibbs, H_class bookkeeping, hap "
            "re-selection and output construction — all of which cost the "
            "reference extra time, so speedups vs samples_per_s_core are "
            "understated."
        ),
        "cpu": cpu_model(),
        "runs": results,
    }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(doc, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
