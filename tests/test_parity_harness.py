"""Golden-output comparison harness (tools/compare_vcf.py).

Until a reference VCF can be produced (PARITY_REPORT.md blocker), the
harness is exercised as a cross-path golden diff: the QUILT1 algorithm
(full-panel FB heuristic) and the QUILT2 algorithm (mspbwt selection) are
largely disjoint code paths that must produce the same genotypes within
the reference's own acceptance tolerances
(check_quilt_output, QUILT/tests/testthat/test-drivers.R:1-89)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel


@pytest.mark.slow
def test_cross_path_golden_diff(tmp_path):
    from compare_vcf import compare

    rng = np.random.default_rng(23)
    K, nSNPs = 150, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=48, use_mspbwt=True, mspbwt_nindices=2,
    )
    samples, names = [], []
    for i in range(2):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        reads, _ = simulate_sample_reads(
            rng, truth, pos, prep.grid, coverage=2.0, read_length_bp=600,
            phred=25,
        )
        samples.append(reads)
        names.append(f"S{i}")
    common = dict(
        nGibbsSamples=3, n_seek_its=2, Ksubset=64, Knew=64,
        small_ref_panel_gibbs_iterations=8, seed=9,
    )
    v1 = str(tmp_path / "quilt1.vcf.gz")
    v2 = str(tmp_path / "quilt2.vcf.gz")
    quilt_impute(prep, samples, names, ImputeConfig(**common),
                 output_filename=v1)
    quilt_impute(prep, samples, names,
                 ImputeConfig(use_mspbwt=True, **common),
                 output_filename=v2)
    report = compare(v1, v2, ds_tol=0.1, gt_tol=0.03, r2_min=0.97)
    assert report["n_sites_shared"] == nSNPs
    assert report["pass"], report
    # negative control: comparing sample columns against a shuffled-truth
    # file must NOT pass (the harness actually discriminates)
    v3 = str(tmp_path / "other.vcf.gz")
    other = [samples[1], samples[0]]          # swapped samples
    quilt_impute(prep, other, names, ImputeConfig(**common),
                 output_filename=v3)
    report_bad = compare(v1, v3, ds_tol=0.1, gt_tol=0.03, r2_min=0.97)
    assert not report_bad["pass"]
