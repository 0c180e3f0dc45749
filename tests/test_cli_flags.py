"""Coverage of the long-tail CLI flags that previously had no effect
(reference semantics cited per test). Each flag must either work or
hard-error — no silently-ignored flags (VERDICT round 1, Weak #5)."""
import argparse
import os

import numpy as np
import pytest

from quilt_tpu.cli import (
    _add_dataclass_args,
    _read_region_exclude,
    _write_sites_vcf,
    main,
)
from quilt_tpu.config import ImputeConfig, PrepareConfig
from quilt_tpu.engine.validators import (
    QuiltValidationError,
    validate_impute_config,
)
from quilt_tpu.io import simulate_panel
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf
from quilt_tpu.out.bgzf import bgzf_open


def _parse(cls, overrides=None, argv=()):
    p = argparse.ArgumentParser()
    _add_dataclass_args(p, cls, overrides=overrides)
    return p.parse_args(list(argv))


def test_impute2_defaults_quilt2():
    """impute2 must default BOTH use_mspbwt and impute_rare_common
    (reference: QUILT2.R:456-460,497-502)."""
    q2 = {"use_mspbwt": True, "impute_rare_common": True}
    args = _parse(ImputeConfig, overrides=q2)
    assert args.use_mspbwt is True
    assert args.impute_rare_common is True
    # explicit flags still win
    args = _parse(ImputeConfig, overrides=q2,
                  argv=["--impute_rare_common", "FALSE"])
    assert args.impute_rare_common is False
    # plain impute keeps QUILT1 defaults
    args = _parse(ImputeConfig)
    assert args.use_mspbwt is False and args.impute_rare_common is False


def test_prepare2_defaults_quilt2():
    q2 = {"use_mspbwt": True, "impute_rare_common": True}
    args = _parse(PrepareConfig, overrides=q2)
    assert args.use_mspbwt is True and args.impute_rare_common is True


def test_estimate_bq_flag_hard_errors():
    cfg = ImputeConfig(chr="chr1", estimate_bq_using_truth_read_labels=True)
    with pytest.raises(QuiltValidationError):
        validate_impute_config(cfg)


def test_heuristic_approach_validated():
    with pytest.raises(QuiltValidationError):
        validate_impute_config(ImputeConfig(chr="chr1", heuristic_approach="C"))
    validate_impute_config(ImputeConfig(chr="chr1", heuristic_approach="B"))


def test_region_exclude_file(tmp_path):
    f = tmp_path / "excl.txt"
    f.write_text(
        "Name Chr Start End\n"
        "HLA-A chr6 100 200\n"
        "HLA-B chr6 500 600\n"
        "OTHER chr7 1 10\n"
    )
    regions = _read_region_exclude(str(f), "chr6")
    assert regions == [(100, 200), (500, 600)]
    with pytest.raises(FileNotFoundError):
        _read_region_exclude(str(tmp_path / "nope.txt"), "chr6")


def test_sites_vcf(tmp_path):
    out = str(tmp_path / "sites.vcf.gz")
    _write_sites_vcf(out, "chr20", [100, 200], ["A", "C"], ["G", "T"])
    lines = list(bgzf_open(out))
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == 2
    assert body[0].split("\t")[:5] == ["chr20", "100", ".", "A", "G"]
    assert os.path.exists(out + ".tbi")


def test_truncate_panel(rng):
    from quilt_tpu.panel.prepare import prepare_panel, truncate_panel

    haps, pos = simulate_panel(rng, K=60, nSNPs=128, region_span=60_000)
    prep = prepare_panel(
        chrom="chr1", pos=pos,
        ref_allele=np.array(["A"] * 128), alt_allele=np.array(["G"] * 128),
        haps=haps,
    )
    small = truncate_panel(prep, 20)
    assert small.K == 20
    assert small.panel.K == 20
    assert np.array_equal(small.rhb_t, prep.rhb_t[:20])
    # af recomputed over the kept haps
    assert np.allclose(small.af, haps[:20].mean(axis=0))


def test_soft_clipped_bases(tmp_path):
    """useSoftClippedBases aligns leading/trailing S bases as if they
    continued the alignment (reference: QUILT.R useSoftClippedBases)."""
    from quilt_tpu.io.bam import load_bam_reads

    pos = np.array([101, 111], dtype=np.int64)
    ref = np.array(["A", "A"])
    alt = np.array(["G", "G"])
    grid = np.zeros(2, dtype=np.int32)
    bam = str(tmp_path / "s.bam")
    with BamWriter(bam, "chr1", 1000) as w:
        # 5S10M starting (aligned) at pos0=105: soft bases cover 100..104,
        # so SNP 101 is ONLY visible with useSoftClippedBases
        seq = "GAAAA" + "A" * 5 + "G" + "A" * 4
        w.write_read("r1", 105, seq, [30] * len(seq),
                     cigar_ops=[("S", 5), ("M", 10)])
    r_no = load_bam_reads(bam, "chr1", pos, ref, alt, grid,
                          bqFilter=17, downsampleToCov=0)
    r_yes = load_bam_reads(bam, "chr1", pos, ref, alt, grid,
                           bqFilter=17, downsampleToCov=0,
                           useSoftClippedBases=True)
    assert r_no.nReads == 1 and len(r_no.u) == 1       # only SNP 111
    assert r_yes.nReads == 1 and len(r_yes.u) == 2     # SNPs 101 + 111
    # SNP 101 read base is G (alt) => positive bq
    i101 = list(r_yes.u).index(0)
    assert r_yes.bq[i101] > 0


@pytest.mark.slow
def test_flags_end_to_end(tmp_path, rng):
    """Pipeline with reference_phred, panel_size, overwrite_existing_vcf,
    record flags, output_RData_filename, sites list."""
    from quilt_tpu.io.simulate import simulate_truth_mosaic

    K, nSNPs = 40, 96
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs, region_span=50_000)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    vcf = str(tmp_path / "panel.vcf.gz")
    write_panel_vcf(vcf, "chr20", pos, ref, alt, haps)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    bam = str(tmp_path / "s0.bam")
    with BamWriter(bam, "chr20", int(pos[-1]) + 1000, sample_name="S0") as w:
        span = pos[-1] - pos[0]
        for r in range(int(2.0 * span / 300)):
            start0 = int(rng.integers(pos[0] - 100, pos[-1]))
            h = int(rng.integers(0, 2))
            seq = []
            for off in range(300):
                gpos = start0 + 1 + off
                si = np.searchsorted(pos, gpos)
                if si < nSNPs and pos[si] == gpos:
                    seq.append("G" if truth[h, si] else "A")
                else:
                    seq.append("C")
            w.write_read(f"r{r}", start0, "".join(seq), [25] * 300)
    bamlist = tmp_path / "bamlist.txt"
    bamlist.write_text(bam + "\n")
    outdir = str(tmp_path / "out")
    rc = main([
        "prepare",
        "--outputdir", outdir, "--chr", "chr20",
        "--reference_vcf_file", vcf,
        "--reference_phred", "20",
        "--make_fake_vcf_with_sites_list", "TRUE",
    ])
    assert rc == 0
    # reference_phred=20 => ref_error 0.01 in the prepared reference
    from quilt_tpu.panel.prepare import PreparedReference
    prep = PreparedReference.load(
        f"{outdir}/RData/QUILT_prepared_reference.chr20.npz"
    )
    assert abs(prep.ref_error - 0.01) < 1e-12
    assert os.path.exists(f"{outdir}/quilt.sites.chr20.vcf.gz")
    npz_out = str(tmp_path / "objects.npz")
    argv = [
        "impute",
        "--outputdir", outdir, "--chr", "chr20",
        "--bamlist", str(bamlist),
        "--panel_size", "30",
        "--nGibbsSamples", "2", "--n_seek_its", "2",
        "--Ksubset", "16", "--Knew", "16",
        "--small_ref_panel_gibbs_iterations", "4",
        "--record_interim_dosages", "TRUE",
        "--record_read_label_usage", "TRUE",
        "--output_RData_filename", npz_out,
        "--print_extra_timing_information", "TRUE",
    ]
    assert main(argv) == 0
    z = np.load(npz_out)
    assert "seek_dosages_S0" in z
    assert "read_label_usage_S0" in z
    assert z["read_label_usage_S0"].shape[0] == 2      # n_seek_its
    # overwrite guard
    assert main(argv + ["--overwrite_existing_vcf", "FALSE"]) == 1


@pytest.mark.slow
def test_add_optimal_haps_to_vcf(tmp_path):
    """addOptimalHapsToVCF adds the OHD FORMAT field when truth haplotypes
    are supplied (reference: functions.R:280-281,1419; writers.R:66-67)."""
    from quilt_tpu.engine import quilt_impute
    from quilt_tpu.io import simulate_sample_reads
    from quilt_tpu.io.simulate import simulate_truth_mosaic
    from quilt_tpu.panel import prepare_panel

    rng = np.random.default_rng(3)
    K, nSNPs = 60, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=32,
    )
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, _ = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=1.5, read_length_bp=600,
        phred=25,
    )
    cfg = ImputeConfig(
        nGibbsSamples=2, n_seek_its=2, Ksubset=32, Knew=32,
        small_ref_panel_gibbs_iterations=6, seed=5,
        addOptimalHapsToVCF=True,
    )
    out_vcf = str(tmp_path / "ohd.vcf.gz")
    quilt_impute(
        prep, [reads], ["S0"], cfg, output_filename=out_vcf,
        truth_gen=truth.sum(axis=0)[:, None],
        truth_haps=truth.T[:, None, :],
    )
    lines = list(bgzf_open(out_vcf))
    assert any("ID=OHD" in l for l in lines if l.startswith("##FORMAT"))
    body = [l for l in lines if not l.startswith("#")]
    fields = body[0].split("\t")
    assert fields[8] == "GT:GP:DS:HD:OHD"
    ohd = fields[9].split(":")[4].split(",")
    assert len(ohd) == 2
    # OHD dosages should track truth closely (labels may swap)
    ohd_mat = np.array(
        [[float(x) for x in l.split("\t")[9].split(":")[4].split(",")]
         for l in body]
    ).T
    tg = truth.sum(axis=0)
    r2 = np.corrcoef(ohd_mat.sum(axis=0), tg)[0, 1] ** 2
    assert r2 > 0.9, f"OHD r2 {r2}"
