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
    # strategy panel: QUILT1 top-K + mspbwt under both match approaches
    assert "QUILT1 top-K" in txt
    assert "mspbwt A" in txt and "mspbwt B" in txt
    # 3 seek iterations per strategy, 3 strategies
    assert txt.count("\n") >= 1 + 3 * 3


def test_read_flip_and_hclass_plots(tmp_path, rng):
    """Read-flip and H_class diagnostic exports (plotting_functions.R
    :553-734 equivalents) produce files from recorded label data."""
    from quilt_tpu.out.plots import plot_hclass, plot_read_label_flips
    lab = rng.integers(0, 2, size=(3, 4, 50))
    out = plot_read_label_flips(str(tmp_path), "S0", "reg", lab)
    assert (tmp_path / "plots" / "readflips.S0.reg.npz").exists()
    H = rng.integers(0, 3, size=(4, 50))
    out2 = plot_hclass(str(tmp_path), "S0", "reg", H)
    assert (tmp_path / "plots" / "hclass.S0.reg.npz").exists()
    import numpy as np
    z = np.load(tmp_path / "plots" / "readflips.S0.reg.npz")
    assert z["flip_fraction"].shape == (3, 50)
    assert float(z["flip_fraction"].max()) <= 0.5


def test_block_gibbs_plot(tmp_path, rng):
    """Block-Gibbs diagnostics (plot_attempt_to_reblock_snps equivalent,
    gibbs-nipt-block.R:2006-2315) render from recorded run data."""
    from quilt_tpu.out.plots import plot_block_gibbs

    nGrids = 40
    L_grid = np.sort(rng.choice(np.arange(1, 2_000_000), nGrids,
                                replace=False))
    smooth = rng.random(nGrids - 1)
    boundaries = np.array([10, 25])
    lab = rng.integers(0, 2, (3, 4, 50))
    out = plot_block_gibbs(
        str(tmp_path), "S0", "chr20.1.100", L_grid=L_grid,
        smooth_rate=smooth, boundaries=boundaries,
        read_label_usage=lab,
        read_grids=rng.integers(0, nGrids, 50),
    )
    import os
    assert os.path.exists(str(tmp_path) + "/plots/blockgibbs.S0.chr20.1.100.npz")
    if out is not None:
        assert os.path.exists(out)
