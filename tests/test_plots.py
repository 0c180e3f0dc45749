import os
import numpy as np

from quilt_tpu.out.plots import plot_sample_diagnostics


def test_plot_diagnostics(tmp_path, rng):
    n = 200
    pos = np.arange(100, 100 + n * 10, 10)
    dosage = rng.random(n) * 2
    gp = rng.dirichlet([1, 1, 1], n).T
    out = plot_sample_diagnostics(
        str(tmp_path), "S1", "chr1", pos, dosage, gp,
        truth_gen=np.round(dosage),
        per_it_likelihoods=rng.random((10, 3, 2)) * -100,
    )
    assert out and os.path.exists(out)
    assert os.path.exists(
        str(tmp_path / "plots" / "haps.S1.chr1.diagnostics.tsv.gz")
    )


def test_heuristic_comparison_plot(rng, tmp_path):
    """make_heuristic_plot writes the hap-selection strategy comparison
    (functional mirror of heuristic.R:40-176)."""
    import os

    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine import quilt_impute
    from quilt_tpu.io import simulate_panel, simulate_sample_reads
    from quilt_tpu.io.simulate import simulate_truth_mosaic
    from quilt_tpu.panel import prepare_panel

    K, nSNPs = 50, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr1", pos=pos, ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["T"] * nSNPs), haps=haps, nMaxDH=32,
        use_mspbwt=True,
    )
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=2.0, read_length_bp=400,
        phred=25,
    )
    cfg = ImputeConfig(
        nGibbsSamples=2, n_seek_its=3, Ksubset=24, Knew=24,
        small_ref_panel_gibbs_iterations=5, seed=3,
        outputdir=str(tmp_path), make_heuristic_plot=True,
    )
    quilt_impute(
        prep, [reads], ["S0"], cfg,
        output_filename=str(tmp_path / "o.vcf.gz"),
        truth_gen=truth.sum(axis=0)[:, None].astype(np.float64),
    )
    files = os.listdir(tmp_path / "plots")
    tsvs = [f for f in files if f.startswith("heuristic.") and
            f.endswith(".tsv")]
    assert tsvs, files
    txt = (tmp_path / "plots" / tsvs[0]).read_text()
    assert "full-panel top-K" in txt and "mspbwt" in txt
    # 3 seek iterations per strategy
    assert txt.count("\n") >= 1 + 2 * 3
