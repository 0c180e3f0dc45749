"""ONT-style long-read, high-error imputation (BASELINE config 3):
per-base-quality-aware emissions must cope with long, error-rich reads."""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel


def test_long_read_high_error(rng, tmp_path):
    K, nSNPs = 100, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=64,
    )
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    # ONT-like: 20kb reads at ~10% error (phred 10), 1x coverage
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=1.0, read_length_bp=20_000,
        phred=10,
    )
    assert np.diff(reads.offsets).max() > 5   # genuinely long reads
    cfg = ImputeConfig(
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=10, seed=2,
    )
    truth_gen = truth.sum(axis=0)[:, None].astype(float)
    out = quilt_impute(
        prep, [reads], ["ONT0"], cfg,
        output_filename=str(tmp_path / "ont.vcf.gz"),
        truth_gen=truth_gen,
    )
    assert out.results[0].imputed
    assert out.r2_per_sample[0] > 0.8, out.r2_per_sample
