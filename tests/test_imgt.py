"""IPD-IMGT/HLA alignment parser (hla/imgt.py) against a synthetic
*_gen.txt in the real format (mirrors the whitespace-token grammar the
reference parses in hla_prepare_functions.R:572-668)."""
import zipfile

import numpy as np

from quilt_tpu.hla.db import HLAGene
from quilt_tpu.hla.imgt import (
    db_from_imgt, load_imgt_zip, parse_imgt_gen_alignment,
)

TEXT = """
 HLA-A Genomic Sequence Alignments
 IPD-IMGT/HLA Release: 3.43.0

 gDNA              -21
                   |
 A*01:01:01:01     ACGTACGTAC GTACGTACG. T|GGGGGCCC CC
 A*01:01:01:02     ---------- --------G. -|-------- --
 A*02:05           -CC------- ------*--. -|--TT---- --
 A*03:77:02        ---------- --------.A -|---C---- --

 gDNA              +10
                   |
 A*01:01:01:01     AAATTTCCC
 A*01:01:01:02     ---G-----
 A*02:05           ---------
 A*03:77:02        ------*--

 Please see http://hla.alleles.org/terms.html for terms of use.
"""


def test_parse_imgt_gen_alignment():
    names, mat = parse_imgt_gen_alignment(TEXT, "A", strand=1)
    assert names == ["A*01:01:01:01", "A*01:01:01:02", "A*02:05",
                     "A*03:77:02"]
    # columns up to and including the reference '|' are trimmed; '|' cols
    # dropped; '-' filled from the reference row
    ref = "".join(mat[0])
    assert ref == "GGGGGCCCCC" + "AAATTTCCC"
    row1 = "".join(mat[1])
    assert row1 == "GGGGGCCCCC" + "AAAGTTCCC"
    row2 = "".join(mat[2])
    assert row2 == "GGTTGCCCCC" + "AAATTTCCC"
    # '*' unknown preserved
    assert "".join(mat[3]) == "GGGCGCCCCC" + "AAATTT*CC"


def test_parse_imgt_negative_strand():
    names, mat = parse_imgt_gen_alignment(TEXT, "A", strand=-1)
    fwd = "GGGGGCCCCC" + "AAATTTCCC"
    rc = fwd.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    assert "".join(mat[0]) == rc


def test_db_from_imgt_and_zip(tmp_path):
    gene = HLAGene(name="A", chrom="chr6", start=100, end=100 + 19 - 1)
    names, mat = parse_imgt_gen_alignment(TEXT, "A")
    db = db_from_imgt(gene, names, mat)
    # 4-digit collapse keeps the first representative per group
    assert db.allele_names == ["A*01:01", "A*02:05", "A*03:77"]
    assert db.seqs.shape == (3, 19)
    assert db.seq_str(0) == "GGGGGCCCCCAAATTTCCC"
    assert db.seq_str(2) == "GGGCGCCCCCAAATTTNCC"
    # zip loading path
    zp = tmp_path / "IMGT.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("alignments/A_gen.txt", TEXT)
    db2 = load_imgt_zip(str(zp), gene)
    np.testing.assert_array_equal(db.seqs, db2.seqs)


def test_cli_hla_prepare_from_imgt_zip(tmp_path, rng):
    """hla-prepare with --ipd_igmt_alignments_zip_file (the reference's
    input format) instead of a prebuilt allele DB."""
    from quilt_tpu.cli import main
    from quilt_tpu.hla.db import BASES, alleles_at_positions
    from quilt_tpu.panel.prepare import prepare_panel

    gene = HLAGene(name="A", chrom="chr6", start=1001, end=1001 + 19 - 1)
    zp = tmp_path / "IMGT.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("alignments/A_gen.txt", TEXT)
    db = load_imgt_zip(str(zp), gene)
    var = np.flatnonzero((db.seqs != db.seqs[0][None, :]).any(axis=0)
                         & (db.seqs < 4).all(axis=0))
    pos = gene.start + var.astype(np.int64)
    ref = np.array([BASES[b] for b in db.seqs[0, var]])
    alt = []
    for s in var:
        col = db.seqs[:, s]
        alt.append(BASES[col[col != db.seqs[0, s]][0]])
    alt = np.array(alt)
    states, _ = alleles_at_positions(db, pos, ref, alt)
    K = 12
    hap_allele = rng.integers(0, db.n_alleles, K)
    haps = np.stack([
        np.where(states[hap_allele[k]] == 1, 1, 0) for k in range(K)
    ]).astype(np.uint8)
    prep = prepare_panel(chrom="chr6", pos=pos, ref_allele=ref,
                         alt_allele=alt, haps=haps)
    prep_file = str(tmp_path / "prep.npz")
    prep.save(prep_file)
    out_file = str(tmp_path / "hla_prep.npz")
    rc = main([
        "hla-prepare",
        "--ipd_igmt_alignments_zip_file", str(zp),
        "--region", "A", "--region_chrom", "chr6",
        "--region_start", str(gene.start), "--region_end", str(gene.end),
        "--prepared_reference_filename", prep_file,
        "--output_file", out_file,
        "--kmer_size", "6",
    ])
    assert rc == 0
    from quilt_tpu.hla.prepare import load_hla_prepared
    hla = load_hla_prepared(out_file)
    assert hla.db.allele_names == ["A*01:01", "A*02:05", "A*03:77"]
