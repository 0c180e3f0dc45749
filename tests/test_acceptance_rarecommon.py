"""QUILT2 rare/common two-stage acceptance (reference:
test-acceptance-rarecommon.R): the seek loop converges on common SNPs, a
final all-SNP Gibbs imputes rare variants via sparse carrier corrections."""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel
from quilt_tpu.out.bgzf import bgzf_open
from quilt_tpu.out.metrics import r2_simple


def test_rare_common_end_to_end(rng, tmp_path):
    K, nSNPs = 100, 640
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    # make some SNPs rare: single carriers
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
    assert prep.snp_is_common is not None
    n_rare = (~prep.snp_is_common).sum()
    assert n_rare >= 40
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid_all, coverage=2.0, read_length_bp=600,
        phred=25,
    )
    cfg = ImputeConfig(
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=8,
        impute_rare_common=True, seed=9,
    )
    truth_gen = truth.sum(axis=0)[:, None].astype(float)
    out = quilt_impute(
        prep, [reads], ["S0"], cfg,
        output_filename=str(tmp_path / "rc.vcf.gz"),
        truth_gen=truth_gen,
    )
    res = out.results[0]
    assert res.imputed
    assert res.dosage.shape == (nSNPs,)       # ALL SNPs imputed
    r2 = out.r2_per_sample[0]
    assert r2 > 0.85, f"all-SNP r2 {r2}"
    # rare-carrier sample check: truth rare genotypes recovered reasonably
    rare = ~prep.snp_is_common
    mean_err = np.abs(res.dosage[rare] - truth_gen[rare, 0]).mean()
    assert mean_err < 0.3, f"rare-SNP dosage error {mean_err}"
    body = [l for l in bgzf_open(str(tmp_path / "rc.vcf.gz"))
            if not l.startswith("#")]
    assert len(body) == nSNPs
