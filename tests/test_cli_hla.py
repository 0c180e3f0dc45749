"""CLI end-to-end HLA typing: files in (panel VCF + BAM + allele DB),
summary tables out."""
import os

import numpy as np
import pytest

from quilt_tpu.cli import main
from quilt_tpu.hla import HLAGene, simulate_hla_db
from quilt_tpu.hla.db import BASES, alleles_at_positions, save_hla_db
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf


@pytest.mark.slow
def test_cli_hla_pipeline(tmp_path, rng):
    gene = HLAGene("HLA-B", "chr6", 5_001, 8_000)
    db = simulate_hla_db(rng, gene, n_alleles=5, n_variant_sites=50)
    var_sites = np.flatnonzero((db.seqs != db.seqs[0][None, :]).any(axis=0))
    pos = gene.start + var_sites.astype(np.int64)
    ref = np.array([BASES[b] for b in db.seqs[0, var_sites]])
    alt = []
    for s in var_sites:
        col = db.seqs[:, s]
        others = col[col != db.seqs[0, s]]
        alt.append(BASES[others[0]])
    alt = np.array(alt)
    K = 30
    hap_allele = rng.integers(0, db.n_alleles, K)
    states, _ = alleles_at_positions(db, pos, ref, alt)
    haps = np.zeros((K, len(pos)), dtype=np.uint8)
    for k in range(K):
        haps[k] = np.where(states[hap_allele[k]] == 1, 1, 0)
    vcf = str(tmp_path / "panel.vcf.gz")
    write_panel_vcf(vcf, "chr6", pos, ref, alt, haps)
    db_path = str(tmp_path / "hla_db.npz")
    save_hla_db(db, db_path)
    # sample: alleles (0, 2); BAM reads are exact allele subsequences
    true_a = (0, 2)
    bam = str(tmp_path / "s.bam")
    with BamWriter(bam, "chr6", 20_000, sample_name="HS") as w:
        L = 150
        for r in range(80):
            a = true_a[r % 2]
            start = int(rng.integers(0, gene.length - L))
            seq = "".join(
                BASES[b] for b in db.seqs[a, start:start + L]
            )
            w.write_read(f"r{r}", gene.start - 1 + start, seq, [30] * L)
    bamlist = tmp_path / "bamlist.txt"
    bamlist.write_text(bam + "\n")
    outdir = str(tmp_path / "out")
    prep_file = str(tmp_path / "prep.npz")
    assert main([
        "prepare", "--outputdir", outdir, "--chr", "chr6",
        "--reference_vcf_file", vcf, "--output_file", prep_file,
    ]) == 0
    hla_prep = str(tmp_path / "hla_prep.npz")
    assert main([
        "hla-prepare", "--hla_db", db_path,
        "--prepared_reference_filename", prep_file,
        "--output_file", hla_prep, "--kmer_size", "8",
    ]) == 0
    assert main([
        "hla", "--outputdir", outdir, "--chr", "chr6",
        "--bamlist", str(bamlist),
        "--prepared_reference_filename", prep_file,
        "--prepared_hla_reference_filename", hla_prep,
        "--nGibbsSamples", "2", "--n_seek_its", "1",
        "--Ksubset", "30", "--Knew", "30",
        "--small_ref_panel_gibbs_iterations", "6",
        "--override_default_params_for_small_ref_panel", "FALSE",
        "--downsampleToCov", "1000",
    ]) == 0
    top = open(
        os.path.join(outdir, "quilt.hla.output.combined.topresult.HLA-B.txt")
    ).read().splitlines()
    assert len(top) == 2
    fields = top[1].split("\t")
    typed = {fields[2], fields[3]}
    expected = {db.allele_names[true_a[0]], db.allele_names[true_a[1]]}
    assert typed == expected, f"typed {typed}, expected {expected}"
