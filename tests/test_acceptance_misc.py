"""Misc acceptance coverage mirroring reference tests:
underflow recovery (test-acceptance-underflow.R), seek burn-in semantics
(test-acceptance-burnin.R), determinism via seed, small-panel override."""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.engine.sample import RegionContext
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel


def _world(rng, coverage=1.5, read_len=600, phred=25, K=80, nSNPs=384):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="c", pos=pos, ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs), haps=haps, nMaxDH=64,
    )
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=coverage,
        read_length_bp=read_len, phred=phred,
    )
    return prep, truth, reads


def test_underflow_recovery_high_coverage(rng, tmp_path):
    """Very high coverage with a tiny maxDifferenceBetweenReads still
    completes via the retry policy (reference: functions.R:2704-2714)."""
    prep, truth, reads = _world(rng, coverage=30.0, read_len=2000, phred=35)
    cfg = ImputeConfig(
        nGibbsSamples=2, n_seek_its=1, Ksubset=32, Knew=32,
        small_ref_panel_gibbs_iterations=6,
        maxDifferenceBetweenReads=1e10,
        downsampleToCov=1000,
    )
    truth_gen = truth.sum(axis=0)[:, None].astype(float)
    out = quilt_impute(
        prep, [reads], ["S"], cfg,
        output_filename=str(tmp_path / "u.vcf.gz"), truth_gen=truth_gen,
    )
    assert out.results[0].imputed
    assert np.isfinite(out.results[0].dosage).all()
    assert out.r2_per_sample[0] > 0.9


def test_seed_determinism(rng, tmp_path):
    prep, truth, reads = _world(rng)
    cfg = ImputeConfig(
        nGibbsSamples=2, n_seek_its=2, Ksubset=32, Knew=32,
        small_ref_panel_gibbs_iterations=6, seed=77,
    )
    out1 = quilt_impute(prep, [reads], ["S"], cfg)
    out2 = quilt_impute(prep, [reads], ["S"], cfg)
    np.testing.assert_array_equal(
        out1.results[0].dosage, out2.results[0].dosage
    )
    np.testing.assert_array_equal(
        out1.results[0].phased_haps, out2.results[0].phased_haps
    )


def test_small_panel_override(rng):
    """K <= Ksubset collapses the seek loop (reference: quilt.R:451-465)."""
    prep, truth, reads = _world(rng, K=40)
    cfg = ImputeConfig(Ksubset=600, Knew=600)
    ctx = RegionContext.build(prep, cfg)
    assert ctx.Ksub == 40 and ctx.Knew == 40
    assert ctx.n_seek_its == 1 and ctx.n_burn_in_seek_its == 0


def test_burn_in_seek_semantics(rng):
    """Only seek iterations past burn-in contribute to the dosage
    (reference: functions.R:999-1020)."""
    prep, truth, reads = _world(rng)
    cfg = ImputeConfig(
        nGibbsSamples=2, n_seek_its=3, n_burn_in_seek_its=2,
        Ksubset=32, Knew=32, small_ref_panel_gibbs_iterations=6,
        override_default_params_for_small_ref_panel=False,
    )
    out = quilt_impute(prep, [reads], ["S"], cfg)
    res = out.results[0]
    gp_sum = res.gp.sum(axis=0)
    np.testing.assert_allclose(gp_sum, 1.0, atol=0.02)


def test_output_diagnostics_dump(rng, tmp_path):
    """output_read_label_prob dumps read labels, the per-iteration
    likelihood matrix and (NIPT) H_class to the output npz (stand-in for
    the reference's RData_objects_to_save, quilt.R:1029-1068)."""
    import os

    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine import quilt_impute
    from quilt_tpu.io import simulate_panel, simulate_sample_reads
    from quilt_tpu.io.simulate import simulate_truth_mosaic
    from quilt_tpu.panel import prepare_panel

    K, nSNPs = 60, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr22", pos=pos, ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["C"] * nSNPs), haps=haps, nMaxDH=32,
    )
    ff = 0.25
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=3.0, read_length_bp=500,
        phred=25, ff=ff,
    )
    cfg = ImputeConfig(
        method="nipt", nGibbsSamples=2, n_seek_its=2, Ksubset=32, Knew=32,
        small_ref_panel_gibbs_iterations=6, seed=5,
        outputdir=str(tmp_path), output_read_label_prob=True,
    )
    out = quilt_impute(
        prep, [reads], ["S0"], cfg,
        output_filename=str(tmp_path / "o.vcf.gz"),
        ff_values=np.array([ff]),
    )
    res = out.results[0]
    assert res.per_it_likelihoods is not None
    assert res.per_it_likelihoods.shape[2] == 8
    assert res.H_class is not None
    assert (res.H_class >= 0).all() and (res.H_class <= 7).all()
    assert (res.H_class > 0).any()
    dumps = [f for f in os.listdir(tmp_path / "RData")
             if f.startswith("quilt.output")]
    assert len(dumps) == 1
    z = np.load(tmp_path / "RData" / dumps[0])
    assert "read_labels_S0" in z and "per_it_likelihoods_S0" in z
    assert "H_class_S0" in z
