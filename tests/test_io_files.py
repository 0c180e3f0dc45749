"""File-format IO tests: BAM roundtrip, panel VCF roundtrip, maps."""
import numpy as np

from quilt_tpu.io import simulate_panel
from quilt_tpu.io.bam import bam_sample_name, load_bam_reads
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf
from quilt_tpu.io.vcf import (
    read_genetic_map,
    read_panel_vcf,
    read_phasefile,
)
from quilt_tpu.panel import assign_positions_to_grid
from quilt_tpu.out.bgzf import BgzfWriter


def test_panel_vcf_roundtrip(tmp_path, rng):
    haps, pos = simulate_panel(rng, K=20, nSNPs=50)
    ref = np.array(list("ACGT" * 13))[:50]
    alt = np.array(list("TACG" * 13))[:50]
    p = str(tmp_path / "panel.vcf.gz")
    write_panel_vcf(p, "chr1", pos, ref, alt, haps)
    out = read_panel_vcf(p)
    np.testing.assert_array_equal(out.haps, haps)
    np.testing.assert_array_equal(out.pos, pos)
    assert out.chrom == "chr1"
    assert len(out.sample_names) == 10
    # sample selection
    out2 = read_panel_vcf(p, keep_samples=["REF0", "REF3"])
    np.testing.assert_array_equal(out2.haps, haps[[0, 1, 6, 7]])
    out3 = read_panel_vcf(p, exclude_samples=["REF0"])
    assert out3.haps.shape[0] == 18


def test_bam_roundtrip(tmp_path, rng):
    # 30 SNPs spaced 10bp; reads of 100bp sampled from a known haplotype
    nSNPs = 30
    pos = np.arange(100, 100 + nSNPs * 10, 10, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    hap = rng.integers(0, 2, nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    p = str(tmp_path / "s.bam")
    chrom_len = 2000
    with BamWriter(p, "chr9", chrom_len, sample_name="NA123") as w:
        for r in range(40):
            start0 = int(rng.integers(50, 400))   # 0-based
            L = 100
            seq = []
            for off in range(L):
                gpos = start0 + 1 + off           # 1-based
                si = np.searchsorted(pos, gpos)
                if si < nSNPs and pos[si] == gpos:
                    seq.append("G" if hap[si] else "A")
                else:
                    seq.append("C")
            w.write_read(f"read{r}", start0, "".join(seq), [30] * L)
    assert bam_sample_name(p) == "NA123"
    reads = load_bam_reads(
        p, "chr9", pos, ref, alt, grid, bqFilter=17, downsampleToCov=1000,
    )
    assert reads.nReads > 0
    # every covered base must agree with the source haplotype
    for r in range(reads.nReads):
        u, bq = reads.read(r)
        for j in range(len(u)):
            expect_alt = hap[u[j]] == 1
            assert (bq[j] > 0) == expect_alt
            assert abs(bq[j]) == 30


def test_bam_mate_merging(tmp_path, rng):
    nSNPs = 10
    pos = np.arange(100, 200, 10, dtype=np.int64)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    p = str(tmp_path / "p.bam")
    with BamWriter(p, "c", 1000) as w:
        # two mates of one fragment covering different SNPs
        w.write_read("frag1", 95, "A" * 20, [30] * 20, tlen=100)
        w.write_read("frag1", 155, "G" * 20, [30] * 20, tlen=-100)
    reads = load_bam_reads(
        p, "c", pos, np.array(["A"] * nSNPs), np.array(["G"] * nSNPs), grid,
        downsampleToCov=1000,
    )
    assert reads.nReads == 1
    u, bq = reads.read(0)
    assert (bq[: (u < 6).sum()] < 0).all()


def test_genetic_map_and_phasefile(tmp_path):
    gm = tmp_path / "map.txt"
    gm.write_text("position COMBINED_rate.cM.Mb. Genetic_Map.cM.\n"
                  "100 1.0 0.0\n200 1.0 0.0001\n")
    pos, cm = read_genetic_map(str(gm))
    assert len(pos) == 2 and cm[1] == 0.0001
    pf = tmp_path / "phase.txt"
    pf.write_text("S1\tS2\n0|1\t1|1\n1|0\t0|0\n")
    names, phase = read_phasefile(str(pf))
    assert names == ["S1", "S2"]
    assert phase.shape == (2, 2, 2)
    assert phase[0, 0, 1] == 1
