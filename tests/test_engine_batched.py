"""Batched multi-sample engine path vs per-sample path."""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel


def test_batched_matches_per_sample_accuracy(rng, tmp_path):
    K, nSNPs = 100, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=64,
    )
    N = 4
    samples, truths = [], []
    for i in range(N):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        # heterogeneous read shapes across samples
        reads, sim = simulate_sample_reads(
            rng, truth, pos, prep.grid, coverage=1.0 + 0.5 * i,
            read_length_bp=400 + 100 * i, phred=25,
        )
        samples.append(reads)
        truths.append(truth)
    truth_gen = np.stack([t.sum(axis=0) for t in truths], axis=1).astype(float)
    names = [f"S{i}" for i in range(N)]
    base = dict(
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=8, seed=21,
    )
    out_b = quilt_impute(
        prep, samples, names, ImputeConfig(sample_batch=4, **base),
        output_filename=str(tmp_path / "b.vcf.gz"), truth_gen=truth_gen,
    )
    out_s = quilt_impute(
        prep, samples, names, ImputeConfig(sample_batch=1, **base),
        output_filename=str(tmp_path / "s.vcf.gz"), truth_gen=truth_gen,
    )
    for i in range(N):
        assert out_b.results[i].imputed
        r2b = out_b.r2_per_sample[i]
        r2s = out_s.r2_per_sample[i]
        assert r2b > 0.85, f"sample {i} batched r2 {r2b}"
        assert abs(r2b - r2s) < 0.1, f"sample {i}: batched {r2b} vs single {r2s}"
