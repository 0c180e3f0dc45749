"""HLA subsystem tests: prepare (kmer DB + hap labeling) and typing
(read mapping x state-posterior combination), mirroring the reference's
pseudo-acceptance HLA test strategy (test-acceptance-hla.R:1-120)."""
import numpy as np
import pytest

from quilt_tpu.hla import (
    HLAGene,
    prepare_hla_reference,
    simulate_hla_db,
    type_hla_sample,
    write_hla_summaries,
)
from quilt_tpu.hla.db import BASES, alleles_at_positions
from quilt_tpu.hla.typing import GeneRead
from quilt_tpu.io import simulate_panel
from quilt_tpu.panel import prepare_panel


@pytest.fixture
def hla_world(rng):
    gene = HLAGene("HLA-A", "chr6", 10_001, 13_000)
    db = simulate_hla_db(rng, gene, n_alleles=6, n_variant_sites=60)
    # panel: SNPs inside the gene at allele-variant sites; each panel hap
    # carries one allele's sequence states
    var_sites = np.flatnonzero(
        (db.seqs != db.seqs[0][None, :]).any(axis=0)
    )
    pos = gene.start + var_sites.astype(np.int64)
    ref = np.array([BASES[b] for b in db.seqs[0, var_sites]])
    # alt: the most common non-ref base at the site
    alt = []
    for j, s in enumerate(var_sites):
        col = db.seqs[:, s]
        others = col[col != db.seqs[0, s]]
        alt.append(BASES[others[0]])
    alt = np.array(alt)
    K = 40
    hap_allele = rng.integers(0, db.n_alleles, K)
    haps = np.zeros((K, len(pos)), dtype=np.uint8)
    for k in range(K):
        states, idx = alleles_at_positions(db, pos, ref, alt)
        st = states[hap_allele[k]]
        haps[k] = np.where(st == 1, 1, 0)
    prep = prepare_panel(
        chrom="chr6", pos=pos, ref_allele=ref, alt_allele=alt, haps=haps,
        nMaxDH=32,
    )
    return gene, db, prep, hap_allele


def test_prepare_labels_haps(hla_world):
    gene, db, prep, hap_allele = hla_world
    hla = prepare_hla_reference(db, prep, k=8)
    labeled = hla.hap_labels >= 0
    assert labeled.mean() > 0.9
    # labels must identify alleles with identical gene-SNP states
    states, idx = alleles_at_positions(
        db, prep.pos, prep.ref_allele, prep.alt_allele
    )
    agree = 0
    for k in np.flatnonzero(labeled):
        if (states[hla.hap_labels[k]] == states[hap_allele[k]]).all():
            agree += 1
    assert agree / labeled.sum() > 0.9


def test_typing_recovers_alleles(hla_world, rng, tmp_path):
    gene, db, prep, hap_allele = hla_world
    hla = prepare_hla_reference(db, prep, k=8)
    true_a = (1, 3)
    reads = []
    L = 120
    for r in range(60):
        a = true_a[r % 2]
        start = int(rng.integers(0, gene.length - L))
        seq = db.seqs[a, start:start + L].copy()
        err = rng.random(L) < 0.002
        seq = np.where(err, (seq + 1) % 4, seq).astype(np.uint8)
        reads.append(GeneRead(
            pos0=gene.start - 1 + start, seq=seq,
            qual=np.full(L, 30),
        ))
    # contaminant reads that should be kmer-filtered
    for r in range(10):
        reads.append(GeneRead(
            pos0=gene.start - 1,
            seq=rng.integers(0, 4, L).astype(np.uint8),
            qual=np.full(L, 30),
        ))
    # fake QUILT gammas: posterior mass on panel haps labeled with truth
    gam = np.zeros(prep.K)
    for k in range(prep.K):
        if hla.hap_labels[k] in true_a:
            gam[k] = 1.0
    gam /= gam.sum()
    res = type_hla_sample(hla, reads, gammas=gam)
    found = {res.bestallele1, res.bestallele2}
    expected = {db.allele_names[true_a[0]], db.allele_names[true_a[1]]}
    assert found == expected, f"typed {found}, expected {expected}"
    assert res.post > 0.9
    # quilt-only mode should also favour the truth pair
    q1 = res.pairs_quilt_only[0]
    assert {q1[0], q1[1]} == expected
    write_hla_summaries(
        {"S0": res}, ["S0"], str(tmp_path), "HLA-A"
    )
    import os
    files = os.listdir(tmp_path)
    assert len([f for f in files if f.startswith("quilt.hla.output")]) == 4


def test_hla_run_through_engine(hla_world, rng):
    """Full pipeline: QUILT run with hla_run=True captures gammas at the
    gene grid; combined with direct reads, typing recovers truth alleles."""
    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine.sample import RegionContext, impute_one_sample
    from quilt_tpu.io.simulate import simulate_sample_reads

    gene, db, prep, hap_allele = hla_world
    hla = prepare_hla_reference(db, prep, k=8)
    true_a = (1, 3)
    states, idx = alleles_at_positions(
        db, prep.pos, prep.ref_allele, prep.alt_allele
    )
    truth = np.stack([
        np.where(states[true_a[0]] == 1, 1, 0),
        np.where(states[true_a[1]] == 1, 1, 0),
    ]).astype(np.uint8)
    reads, sim = simulate_sample_reads(
        rng, truth, prep.pos, prep.grid, coverage=2.0, read_length_bp=400,
        phred=28,
    )
    cfg = ImputeConfig(
        nGibbsSamples=3, n_seek_its=1, Ksubset=40, Knew=40,
        small_ref_panel_gibbs_iterations=8, hla_run=True,
        gamma_physically_closest_to=(gene.start + gene.end) // 2,
        override_default_params_for_small_ref_panel=False,
    )
    ctx = RegionContext.build(prep, cfg)
    assert ctx.hla_capture
    res = impute_one_sample(ctx, reads, cfg, seed=11)
    assert res.hla_gammas is not None
    assert res.hla_gamma_total is not None
    # gamma mass should sit on panel haps labeled with the truth alleles
    prior = hla.allele_prior_from_gamma(res.hla_gamma_total)
    top2 = set(np.argsort(-prior)[:2].tolist())
    assert top2 == set(true_a), f"gamma alleles {top2} vs truth {set(true_a)}"
    # direct reads + gammas => typing
    L = 120
    gene_reads = []
    for r in range(40):
        a = true_a[r % 2]
        start = int(rng.integers(0, gene.length - L))
        seq = db.seqs[a, start:start + L].copy()
        gene_reads.append(GeneRead(
            pos0=gene.start - 1 + start, seq=seq, qual=np.full(L, 30),
        ))
    res_t = type_hla_sample(hla, gene_reads, gammas=res.hla_gamma_total)
    expected = {db.allele_names[true_a[0]], db.allele_names[true_a[1]]}
    assert {res_t.bestallele1, res_t.bestallele2} == expected


def test_phase_hla_haplotypes(hla_world, rng, tmp_path):
    """Two-step phasing (hla_prepare_phase_functions.R:252-813): unordered
    per-sample diploid types + panel haplotypes -> per-hap allele labels."""
    from quilt_tpu.hla.prepare import (
        load_hla_types_panel,
        normalize_hla_type,
        phase_hla_haplotypes,
        prepare_hla_reference,
    )

    gene, db, prep, hap_allele = hla_world
    nSamp = prep.K // 2
    states, _ = alleles_at_positions(
        db, prep.pos, prep.ref_allele, prep.alt_allele
    )
    t1, t2 = [], []
    flip = rng.random(nSamp) < 0.5
    for i in range(nSamp):
        x1 = normalize_hla_type(db.allele_names[hap_allele[2 * i]])
        x2 = normalize_hla_type(db.allele_names[hap_allele[2 * i + 1]])
        t1.append(x2 if flip[i] else x1)
        t2.append(x1 if flip[i] else x2)
    labels, phased = phase_hla_haplotypes(db, prep, t1, t2)
    assert phased.mean() > 0.8
    ok = 0
    n = 0
    for k in range(prep.K):
        if labels[k] < 0:
            continue
        n += 1
        if (states[labels[k]] == states[hap_allele[k]]).all():
            ok += 1
    assert n > 0 and ok / n > 0.9

    # types-panel file loader + full prepare path with sample names
    prep.sample_names = np.array([f"S{i}" for i in range(nSamp)])
    tsv = tmp_path / "hla_types.tsv"
    region = gene.name.split("-")[-1]
    with open(tsv, "w") as fh:
        fh.write(f"Region\tPop\tSample.ID\tHLA.{region}.1\tHLA.{region}.2\n")
        for i in range(nSamp):
            fh.write(f"x\ty\tS{i}\t{gene.name}*{t1[i]}\t{t2[i]}\n")
    hla_types = load_hla_types_panel(str(tsv), region)
    hla = prepare_hla_reference(db, prep, k=8, hla_types=hla_types)
    assert (hla.hap_labels == labels).all()


def test_sample_names_roundtrip(hla_world, tmp_path):
    gene, db, prep, hap_allele = hla_world
    prep.sample_names = np.array([f"S{i}" for i in range(prep.K // 2)])
    p = tmp_path / "prep.npz"
    prep.save(str(p))
    from quilt_tpu.panel.prepare import PreparedReference

    prep2 = PreparedReference.load(str(p))
    assert [str(x) for x in prep2.sample_names] == \
        [str(x) for x in prep.sample_names]


def test_alt_contig_reads_and_kmer_placement(hla_world, rng, tmp_path):
    """Second read source (HLA alt contigs): extraction filters mirror
    filter_that2; unplaced reads are kmer-seeded onto the allele alignment
    (incl. reverse complements) and drive typing to the right allele."""
    from quilt_tpu.hla.typing import (
        build_seed_index, place_read_by_kmers, revcomp_codes,
        type_hla_sample,
    )
    from quilt_tpu.io.bam import load_hla_alt_contig_reads
    from quilt_tpu.io.bam_writer import BamWriter
    gene, db, prep, hap_allele = hla_world
    hla = prepare_hla_reference(db, prep, k=8)
    true_allele = 3
    L = 90

    def allele_read(start_off):
        seq = db.seqs[true_allele, start_off:start_off + L].copy()
        return seq

    # --- kmer placement: forward and revcomp reads recover their offset
    seed_idx = build_seed_index(db, hla.k)
    for start in (50, 400, 1200):
        seq = allele_read(start)
        st, v = place_read_by_kmers(seq, seed_idx, hla.k)
        assert st == start and v >= 2
        st_r, v_r = place_read_by_kmers(revcomp_codes(seq), seed_idx, hla.k)
        # revcomp of the read should NOT place well forward
        assert v_r <= v

    # --- BAM with an alt contig holding the gene reads
    bam = str(tmp_path / "alt.bam")
    contig = "HLA-A*01:01:01:01"
    with BamWriter(bam, "chr6", 50_000,
                   extra_contigs=[(contig, 5000), ("chr7", 1000)]) as w:
        n_alt = 0
        for i, start in enumerate(range(100, 1900, 150)):
            seq_codes = allele_read(start)
            seq = "".join("ACGT"[b] if b < 4 else "N" for b in seq_codes)
            w.write_read(f"alt{i}", 10 + i, seq, [30] * L, tid=1)
            n_alt += 1
        # filtered out: mate on chr7 (another primary chromosome)
        w.write_read("bad_mate", 20, "ACGT" * 22 + "AC", [30] * 90,
                     tid=1, next_tid=2, next_pos=100)
        # filtered out: XA alt-mapping to chr1
        w.write_read("bad_xa", 30, "ACGT" * 22 + "AC", [30] * 90,
                     tid=1, xa="chr1,+5000,90M,0;")
        # kept: XA within the gene region on chr6
        seq_codes = allele_read(700)
        seq = "".join("ACGT"[b] if b < 4 else "N" for b in seq_codes)
        w.write_read("ok_xa", 40, seq, [30] * L, tid=1,
                     xa=f"chr6,+{gene.start + 700},90M,1;")
        n_alt += 1
    out = load_hla_alt_contig_reads(
        bam, "A", "chr6", gene.start, gene.end
    )
    qnames = [qn for qn, _s, _q in out]
    assert "bad_mate" not in qnames and "bad_xa" not in qnames
    assert "ok_xa" in qnames
    assert len(out) == n_alt

    # --- typing from alt-contig reads alone (pos0=-1 -> kmer placement),
    # with some reads reverse-complemented
    gene_reads = []
    for i, (qn, seq, q) in enumerate(out):
        if i % 3 == 0:
            seq = revcomp_codes(seq)
            q = q[::-1]
        gene_reads.append(GeneRead(pos0=-1, seq=seq, qual=q))
    res = type_hla_sample(hla, gene_reads, kmer_min_fraction=0.3)
    got = {res.bestallele1, res.bestallele2}
    assert db.allele_names[true_allele] in got


def test_hla_run_on_mesh(hla_world, rng):
    """hla_run with the panel-sharded FB (mesh_panel > 1): the r3 assert
    blocking gamma capture on the mesh is lifted; gammas still identify
    the truth alleles."""
    import jax
    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine.sample import RegionContext, impute_one_sample
    from quilt_tpu.io.simulate import simulate_sample_reads

    assert len(jax.devices()) >= 8
    gene, db, prep, hap_allele = hla_world
    hla = prepare_hla_reference(db, prep, k=8)
    true_a = (1, 3)
    states, idx = alleles_at_positions(
        db, prep.pos, prep.ref_allele, prep.alt_allele
    )
    truth = np.stack([
        np.where(states[true_a[0]] == 1, 1, 0),
        np.where(states[true_a[1]] == 1, 1, 0),
    ]).astype(np.uint8)
    reads, sim = simulate_sample_reads(
        rng, truth, prep.pos, prep.grid, coverage=2.0, read_length_bp=400,
        phred=28,
    )
    cfg = ImputeConfig(
        nGibbsSamples=3, n_seek_its=1, Ksubset=40, Knew=40,
        small_ref_panel_gibbs_iterations=8, hla_run=True,
        gamma_physically_closest_to=(gene.start + gene.end) // 2,
        override_default_params_for_small_ref_panel=False,
        mesh_data=2, mesh_panel=4,
    )
    ctx = RegionContext.build(prep, cfg)
    assert ctx.hla_capture and ctx.sharded_fb is not None
    res = impute_one_sample(ctx, reads, cfg, seed=11)
    assert res.hla_gamma_total is not None
    prior = hla.allele_prior_from_gamma(res.hla_gamma_total)
    top2 = set(np.argsort(-prior)[:2].tolist())
    assert top2 == set(true_a), f"gamma alleles {top2} vs truth {set(true_a)}"
