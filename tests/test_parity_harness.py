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


@pytest.mark.slow
def test_cross_path_golden_diff_nipt(tmp_path):
    """NIPT: the mspbwt-selection path and the full-panel heuristic path
    must produce consistent maternal genotypes (extends the diploid-only
    round-2 cross diff to the NIPT config; reference acceptance analogue
    test-acceptance-nipt.R)."""
    from compare_vcf import compare

    rng = np.random.default_rng(31)
    K, nSNPs = 120, 448
    ff = 0.2
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=48, use_mspbwt=True, mspbwt_nindices=2,
    )
    samples, names = [], []
    for i in range(2):
        truth = simulate_truth_mosaic(rng, haps, n_latent=3)
        reads, _ = simulate_sample_reads(
            rng, truth, pos, prep.grid, coverage=3.0, read_length_bp=600,
            phred=25, ff=ff,
        )
        samples.append(reads)
        names.append(f"N{i}")
    ffv = np.full(2, ff)
    common = dict(
        method="nipt", nGibbsSamples=3, n_seek_its=2, Ksubset=64, Knew=64,
        small_ref_panel_gibbs_iterations=8, seed=5,
    )
    v1 = str(tmp_path / "nipt1.vcf.gz")
    v2 = str(tmp_path / "nipt2.vcf.gz")
    quilt_impute(prep, samples, names, ImputeConfig(**common),
                 output_filename=v1, ff_values=ffv)
    quilt_impute(prep, samples, names,
                 ImputeConfig(use_mspbwt=True, **common),
                 output_filename=v2, ff_values=ffv)
    # maternal DS r2 ~0.99 between the paths; hard GT calls at 3x with a
    # 20% fetal fraction flip at uncertain hets, so the GT bar is looser
    report = compare(v1, v2, ds_tol=0.15, gt_tol=0.15, r2_min=0.95)
    assert report["n_sites_shared"] == nSNPs
    assert report["pass"], report


@pytest.mark.slow
def test_cross_path_golden_diff_rare_common(tmp_path):
    """rare/common two-stage vs the all-SNP single-stage path: genotypes
    must agree within acceptance tolerances at the shared sites."""
    from compare_vcf import compare

    rng = np.random.default_rng(41)
    K, nSNPs = 150, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)

    def _prep(rc):
        return prepare_panel(
            chrom="chr20", pos=pos,
            ref_allele=np.array(["A"] * nSNPs),
            alt_allele=np.array(["G"] * nSNPs),
            haps=haps, nMaxDH=48, use_mspbwt=True, mspbwt_nindices=2,
            impute_rare_common=rc, rare_af_threshold=0.05,
        )
    prep_rc = _prep(True)
    assert prep_rc.snp_is_common is not None
    assert 0 < prep_rc.snp_is_common.sum() < nSNPs
    prep_all = _prep(False)
    samples, names = [], []
    for i in range(2):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        reads, _ = simulate_sample_reads(
            rng, truth, pos, prep_all.grid, coverage=2.5,
            read_length_bp=600, phred=25,
        )
        samples.append(reads)
        names.append(f"R{i}")
    common = dict(
        nGibbsSamples=3, n_seek_its=2, Ksubset=64, Knew=64,
        small_ref_panel_gibbs_iterations=8, seed=13, use_mspbwt=True,
    )
    v1 = str(tmp_path / "allsnp.vcf.gz")
    v2 = str(tmp_path / "rarecommon.vcf.gz")
    quilt_impute(prep_all, samples, names, ImputeConfig(**common),
                 output_filename=v1)
    quilt_impute(prep_rc, samples, names,
                 ImputeConfig(impute_rare_common=True, **common),
                 output_filename=v2)
    # rare sites are imputed through genuinely different machinery; the
    # acceptance bar is r2 over all shared sites plus DS closeness
    report = compare(v1, v2, ds_tol=0.2, gt_tol=0.08, r2_min=0.9)
    assert report["n_sites_shared"] == nSNPs
    assert report["pass"], report
