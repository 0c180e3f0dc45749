"""CLI end-to-end: files in (panel VCF + BAMs + map), VCF out.

The full-stack analog of the reference's CLI test (scripts/test-cli.R):
everything flows through real file formats.
"""
import numpy as np
import pytest

from quilt_tpu.cli import main
from quilt_tpu.io import simulate_panel
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf
from quilt_tpu.out.bgzf import bgzf_open


@pytest.mark.slow
def test_cli_prepare_and_impute(tmp_path, rng):
    K, nSNPs = 80, 384
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs, region_span=200_000)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    vcf = str(tmp_path / "panel.vcf.gz")
    write_panel_vcf(vcf, "chr20", pos, ref, alt, haps)
    gmap = tmp_path / "map.txt"
    gmap.write_text(
        "position COMBINED_rate.cM.Mb. Genetic_Map.cM.\n"
        + f"{pos[0]} 1.0 0.0\n{pos[-1]} 1.0 {(pos[-1]-pos[0])/1e6:.6f}\n"
    )
    # two samples' BAMs
    truths = []
    bams = []
    for i in range(2):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        truths.append(truth)
        bam = str(tmp_path / f"s{i}.bam")
        with BamWriter(bam, "chr20", int(pos[-1]) + 1000,
                       sample_name=f"SAMP{i}") as w:
            span = pos[-1] - pos[0]
            n_reads = int(2.0 * span / 300)
            for r in range(n_reads):
                start0 = int(rng.integers(pos[0] - 100, pos[-1]))
                L = 300
                h = int(rng.integers(0, 2))
                seq = []
                for off in range(L):
                    gpos = start0 + 1 + off
                    si = np.searchsorted(pos, gpos)
                    if si < nSNPs and pos[si] == gpos:
                        a = truth[h, si]
                        if rng.random() < 0.003:
                            a = 1 - a
                        seq.append("G" if a else "A")
                    else:
                        seq.append("C")
                w.write_read(f"r{r}", start0, "".join(seq), [25] * L)
        bams.append(bam)
    bamlist = tmp_path / "bamlist.txt"
    bamlist.write_text("\n".join(bams) + "\n")
    outdir = str(tmp_path / "out")
    rc = main([
        "prepare",
        "--outputdir", outdir,
        "--chr", "chr20",
        "--reference_vcf_file", vcf,
        "--genetic_map_file", str(gmap),
        "--nGen", "100",
    ])
    assert rc == 0
    rc = main([
        "impute",
        "--outputdir", outdir,
        "--chr", "chr20",
        "--bamlist", str(bamlist),
        "--nGibbsSamples", "3",
        "--n_seek_its", "2",
        "--Ksubset", "48",
        "--Knew", "48",
        "--small_ref_panel_gibbs_iterations", "8",
    ])
    assert rc == 0
    vcf_out = f"{outdir}/quilt.chr20.vcf.gz"
    lines = list(bgzf_open(vcf_out))
    header = [l for l in lines if l.startswith("#CHROM")][0]
    assert header.rstrip("\n").split("\t")[9:] == ["SAMP0", "SAMP1"]
    body = [l for l in lines if not l.startswith("#")]
    assert len(body) == nSNPs
    # imputation accuracy vs truth from the full file pipeline
    for i in range(2):
        ds = np.array(
            [float(l.split("\t")[9 + i].split(":")[2]) for l in body]
        )
        tg = truths[i].sum(axis=0)
        r2 = np.corrcoef(ds, tg)[0, 1] ** 2
        assert r2 > 0.85, f"sample {i} r2 {r2}"
