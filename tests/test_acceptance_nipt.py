"""NIPT (cfDNA mother+fetus triploid) end-to-end acceptance.

Mirrors the reference's NIPT tests (test-acceptance-nipt.R): three latent
haplotypes (maternal transmitted / maternal untransmitted / paternal
transmitted), read priors (0.5, (1-ff)/2, ff/2), outputs MGP/MDS/FGP/FDS.
"""
import numpy as np

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel
from quilt_tpu.out.bgzf import bgzf_open
from quilt_tpu.out.metrics import r2_simple


def test_nipt_end_to_end(rng, tmp_path):
    K, nSNPs = 100, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr21", pos=pos,
        ref_allele=np.array(["C"] * nSNPs),
        alt_allele=np.array(["T"] * nSNPs),
        haps=haps, nMaxDH=64,
    )
    ff = 0.2
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=4.0, read_length_bp=600,
        phred=25, ff=ff,
    )
    cfg = ImputeConfig(
        method="nipt",
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=10, seed=4,
    )
    out = quilt_impute(
        prep, [reads], ["S0"], cfg,
        output_filename=str(tmp_path / "nipt.vcf.gz"),
        ff_values=np.array([ff]),
    )
    res = out.results[0]
    assert res.imputed
    mat_truth = truth[0] + truth[1]
    fet_truth = truth[0] + truth[2]
    r2m = r2_simple(mat_truth.astype(float), res.mat_dosage)
    r2f = r2_simple(fet_truth.astype(float), res.fet_dosage)
    assert r2m > 0.85, f"maternal r2 {r2m}"
    assert r2f > 0.5, f"fetal r2 {r2f}"
    # VCF format
    lines = list(bgzf_open(str(tmp_path / "nipt.vcf.gz")))
    body = [l for l in lines if not l.startswith("#")]
    fields = body[0].rstrip("\n").split("\t")
    assert fields[8] == "GT:MGP:MDS:FGP:FDS"
    gt = fields[9].split(":")[0]
    assert gt.count("|") == 2
