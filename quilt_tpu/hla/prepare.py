"""HLA reference preparation.

Functional equivalent of QUILT_HLA_prepare_reference (reference:
QUILT/R/quilt-hla-prepare-reference.R:26-119 + hla_prepare_functions.R +
hla_prepare_phase_functions.R): build the kmer filter database over all
allele sequences and label each reference-panel haplotype with its best
4-digit allele.

Deviation (documented): the reference phases panel haplotypes onto alleles
with a two-step EM (phase_hla_haplotypes, hla_prepare_phase_functions.R:
1-251); here each haplotype is assigned by maximum per-SNP agreement with
each allele's implied ref/alt states — a direct likelihood assignment that
serves the same purpose for the posterior-combination step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..panel.prepare import PreparedReference
from ..utils import print_message, unpack_bits_32
from .db import BASES, HLAAlleleDB, alleles_at_positions


def build_kmer_set(db: HLAAlleleDB, k: int = 10) -> Set[int]:
    """All k-mers (2-bit packed) present in any allele sequence
    (equivalent of make_and_save_hla_all_alleles_kmers,
    hla_prepare_functions.R:213)."""
    kmers: Set[int] = set()
    for a in range(db.n_alleles):
        seq = db.seqs[a]
        code = 0
        valid = 0
        for b in seq:
            if b >= 4:
                code, valid = 0, 0
                continue
            code = ((code << 2) | int(b)) & ((1 << (2 * k)) - 1)
            valid += 1
            if valid >= k:
                kmers.add(code)
    return kmers


@dataclass
class HLAPrepared:
    db: HLAAlleleDB
    kmers: Set[int]
    k: int
    hap_labels: np.ndarray         # int32 [K] allele index per panel hap (-1 none)
    hap_label_scores: np.ndarray   # float [K] agreement fraction
    gene_snp_idx: np.ndarray       # panel SNP indices inside the gene
    gamma_grid: int                # grid closest to the gene centre

    def allele_prior_from_gamma(self, gamma: np.ndarray) -> np.ndarray:
        """Map a full-panel state posterior [K] to allele probabilities [A]
        via the haplotype labels (equivalent of the state-posterior ->
        allele likelihood combination, hla_functions.R:757-852)."""
        A = self.db.n_alleles
        out = np.zeros(A)
        w = self.hap_labels >= 0
        np.add.at(out, self.hap_labels[w], gamma[: len(self.hap_labels)][w])
        s = out.sum()
        if s > 0:
            out /= s
        else:
            out[:] = 1.0 / A
        return out


def prepare_hla_reference(
    db: HLAAlleleDB,
    prep: PreparedReference,
    k: int = 10,
) -> HLAPrepared:
    g = db.gene
    states, gene_idx = alleles_at_positions(
        db, prep.pos, prep.ref_allele, prep.alt_allele
    )
    K = prep.K
    haps_gene = unpack_bits_32(prep.rhb_t, prep.nSNPs)[:, gene_idx]
    A = db.n_alleles
    # agreement score per (hap, allele) over sites where the allele is
    # ref/alt-consistent
    labels = np.full(K, -1, dtype=np.int32)
    scores = np.zeros(K)
    if len(gene_idx):
        agree = np.zeros((K, A))
        for a in range(A):
            known = states[a] >= 0
            if known.sum() == 0:
                continue
            agree[:, a] = (
                (haps_gene[:, known] == states[a][known][None, :]).mean(axis=1)
            )
        labels = agree.argmax(axis=1).astype(np.int32)
        scores = agree.max(axis=1)
        labels[scores < 0.5] = -1
    gamma_grid = int(prep.grid[gene_idx[len(gene_idx) // 2]]) if len(gene_idx) \
        else int(prep.grid[np.abs(prep.pos - (g.start + g.end) // 2).argmin()])
    print_message(
        f"HLA prepare {g.name}: {A} alleles, {len(gene_idx)} gene SNPs, "
        f"{(labels >= 0).sum()}/{K} haps labeled, gamma grid {gamma_grid}"
    )
    return HLAPrepared(
        db=db,
        kmers=build_kmer_set(db, k),
        k=k,
        hap_labels=labels,
        hap_label_scores=scores,
        gene_snp_idx=gene_idx,
        gamma_grid=gamma_grid,
    )


def save_hla_prepared(hla: HLAPrepared, path: str) -> None:
    np.savez_compressed(
        path,
        gene_name=np.array(hla.db.gene.name),
        gene_chrom=np.array(hla.db.gene.chrom),
        gene_span=np.array([hla.db.gene.start, hla.db.gene.end]),
        allele_names=np.asarray(hla.db.allele_names),
        seqs=hla.db.seqs,
        kmers=np.fromiter(hla.kmers, dtype=np.int64),
        k=np.array(hla.k),
        hap_labels=hla.hap_labels,
        hap_label_scores=hla.hap_label_scores,
        gene_snp_idx=hla.gene_snp_idx,
        gamma_grid=np.array(hla.gamma_grid),
    )


def load_hla_prepared(path: str) -> HLAPrepared:
    from .db import HLAGene, HLAAlleleDB

    z = np.load(path, allow_pickle=False)
    gene = HLAGene(
        name=str(z["gene_name"]),
        chrom=str(z["gene_chrom"]),
        start=int(z["gene_span"][0]),
        end=int(z["gene_span"][1]),
    )
    db = HLAAlleleDB(
        gene=gene,
        allele_names=[str(x) for x in z["allele_names"]],
        seqs=z["seqs"],
    )
    return HLAPrepared(
        db=db,
        kmers=set(int(x) for x in z["kmers"]),
        k=int(z["k"]),
        hap_labels=z["hap_labels"],
        hap_label_scores=z["hap_label_scores"],
        gene_snp_idx=z["gene_snp_idx"],
        gamma_grid=int(z["gamma_grid"]),
    )
