"""End-to-end acceptance test of the diploid QUILT1 path on simulated data.

Mirrors the reference's acceptance strategy (check_quilt_output,
QUILT/R/test-drivers.R:1-89): simulate a panel + truth samples + reads,
run the full engine, require high dosage r2 vs truth, valid GP columns,
and a parseable VCF.
"""
import numpy as np
import pytest

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine import quilt_impute
from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import prepare_panel
from quilt_tpu.out.bgzf import bgzf_open


@pytest.fixture(scope="module")
def sim_world():
    rng = np.random.default_rng(11)
    K, nSNPs = 120, 640
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20",
        pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps,
        nMaxDH=32,
        nGen=100,
    )
    N = 3
    samples, truths = [], []
    for i in range(N):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        reads, sim = simulate_sample_reads(
            rng, truth, pos, prep.grid, coverage=1.5, read_length_bp=600,
            phred=25,
        )
        samples.append(reads)
        truths.append(truth)
    return prep, samples, truths, rng


def test_diploid_end_to_end(sim_world, tmp_path):
    prep, samples, truths, rng = sim_world
    cfg = ImputeConfig(
        nGibbsSamples=3,
        n_seek_its=2,
        Ksubset=64,
        Knew=64,
        small_ref_panel_gibbs_iterations=10,
        seed=5,
    )
    truth_gen = np.stack([t.sum(axis=0) for t in truths], axis=1)
    truth_haps = np.stack([t.T for t in truths], axis=1)
    out = quilt_impute(
        prep,
        samples,
        [f"S{i}" for i in range(len(samples))],
        cfg,
        output_filename=str(tmp_path / "out.vcf.gz"),
        truth_gen=truth_gen,
        truth_haps=truth_haps,
    )
    assert all(r.imputed for r in out.results)
    for i, res in enumerate(out.results):
        gp_sum = res.gp.sum(axis=0)
        assert (np.abs(gp_sum - 1) < 0.02).all(), "GP must sum to ~1"
        r2 = out.r2_per_sample[i]
        assert r2 > 0.9, f"sample {i}: r2 {r2}"
        # haplotype dosages should match truth up to label swap
        ph = res.phased_haps
        t = truths[i]
        direct = (np.abs(ph[0] - t[0]).mean() + np.abs(ph[1] - t[1]).mean()) / 2
        swapped = (np.abs(ph[0] - t[1]).mean() + np.abs(ph[1] - t[0]).mean()) / 2
        assert min(direct, swapped) < 0.15
    # VCF sanity
    lines = list(bgzf_open(str(tmp_path / "out.vcf.gz")))
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == prep.nSNPs
    fields = body[0].rstrip("\n").split("\t")
    assert len(fields) == 9 + len(samples)
    assert fields[8] == "GT:GP:DS:HD"
    assert "INFO_SCORE=" in fields[7]
    gt = fields[9].split(":")[0]
    assert "|" in gt


def test_few_reads_sample_missing_column(sim_world, tmp_path):
    prep, samples, truths, rng = sim_world
    from quilt_tpu.io.reads import SampleReads
    empty = SampleReads(
        u=np.zeros(1, dtype=np.int32),
        bq=np.array([25], dtype=np.int16),
        offsets=np.array([0, 1], dtype=np.int64),
        wif0=np.zeros(1, dtype=np.int32),
    )
    cfg = ImputeConfig(
        nGibbsSamples=1, n_seek_its=1, Ksubset=32, Knew=32,
        small_ref_panel_gibbs_iterations=4,
    )
    out = quilt_impute(
        prep, [empty], ["S0"], cfg,
        output_filename=str(tmp_path / "o.vcf.gz"),
    )
    assert not out.results[0].imputed
    lines = [l for l in bgzf_open(str(tmp_path / "o.vcf.gz"))
             if not l.startswith("#")]
    assert lines[0].rstrip("\n").split("\t")[9] == "./.:.,.,.:.:.,."
