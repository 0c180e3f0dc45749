"""Batched multi-sample engine path vs per-sample path."""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.out.bgzf import bgzf_open
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


def test_batched_rare_common(rng, tmp_path):
    """Batched QUILT2 flagship path (impute_rare_common): the all-SNP
    final Gibbs runs through engine/batch.py for the whole batch."""
    K, nSNPs = 100, 640
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rare_sites = rng.choice(nSNPs, 40, replace=False)
    for s in rare_sites:
        haps[:, s] = 0
        haps[rng.integers(0, K), s] = 1
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=64,
        impute_rare_common=True, rare_af_threshold=0.03,
    )
    N = 3
    samples, truths = [], []
    for i in range(N):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        reads, sim = simulate_sample_reads(
            rng, truth, pos, prep.grid_all, coverage=2.0,
            read_length_bp=500 + 100 * i, phred=25,
        )
        samples.append(reads)
        truths.append(truth)
    truth_gen = np.stack(
        [t.sum(axis=0) for t in truths], axis=1
    ).astype(float)
    names = [f"S{i}" for i in range(N)]
    base = dict(
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=8, impute_rare_common=True,
        seed=13,
    )
    out_b = quilt_impute(
        prep, samples, names, ImputeConfig(sample_batch=4, **base),
        output_filename=str(tmp_path / "rcb.vcf.gz"), truth_gen=truth_gen,
    )
    out_s = quilt_impute(
        prep, samples, names, ImputeConfig(sample_batch=1, **base),
        output_filename=str(tmp_path / "rcs.vcf.gz"), truth_gen=truth_gen,
    )
    rare = ~prep.snp_is_common
    for i in range(N):
        res = out_b.results[i]
        assert res.imputed
        assert res.dosage.shape == (nSNPs,)
        r2b, r2s = out_b.r2_per_sample[i], out_s.r2_per_sample[i]
        assert r2b > 0.85, f"sample {i} batched all-SNP r2 {r2b}"
        assert abs(r2b - r2s) < 0.1, f"sample {i}: {r2b} vs {r2s}"
        mean_err = np.abs(res.dosage[rare] - truth_gen[rare, i]).mean()
        assert mean_err < 0.3, f"sample {i} rare-SNP dosage error {mean_err}"


def test_batched_nipt_groups_by_ff(rng, tmp_path):
    """Batched NIPT: samples grouped by fetal fraction, MGP/FGP outputs
    match the per-sample path's accuracy."""
    from quilt_tpu.out.metrics import r2_simple
    K, nSNPs = 100, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr21", pos=pos,
        ref_allele=np.array(["C"] * nSNPs),
        alt_allele=np.array(["T"] * nSNPs),
        haps=haps, nMaxDH=64,
    )
    # two samples share ff=0.2, one has ff=0.3 -> groups {0,1}, {2}
    ffs = np.array([0.2, 0.2, 0.3])
    N = 3
    samples, truths = [], []
    for i in range(N):
        truth = simulate_truth_mosaic(rng, haps, n_latent=3)
        reads, sim = simulate_sample_reads(
            rng, truth, pos, prep.grid, coverage=4.0, read_length_bp=600,
            phred=25, ff=float(ffs[i]),
        )
        samples.append(reads)
        truths.append(truth)
    names = [f"S{i}" for i in range(N)]
    cfg = ImputeConfig(
        method="nipt", sample_batch=4,
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=10, seed=4,
    )
    out = quilt_impute(
        prep, samples, names, cfg,
        output_filename=str(tmp_path / "niptb.vcf.gz"), ff_values=ffs,
    )
    for i in range(N):
        res = out.results[i]
        assert res.imputed
        mat_truth = (truths[i][0] + truths[i][1]).astype(float)
        fet_truth = (truths[i][0] + truths[i][2]).astype(float)
        r2m = r2_simple(mat_truth, res.mat_dosage)
        r2f = r2_simple(fet_truth, res.fet_dosage)
        assert r2m > 0.85, f"sample {i} maternal r2 {r2m}"
        assert r2f > 0.5, f"sample {i} fetal r2 {r2f}"
    body = [l for l in bgzf_open(str(tmp_path / "niptb.vcf.gz"))
            if not l.startswith("#")]
    assert body[0].split("\t")[8] == "GT:MGP:MDS:FGP:FDS"
