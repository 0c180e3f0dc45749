"""Rare/common two-stage imputation (QUILT2 impute_rare_common).

Functional equivalent of impute_final_gibbs_with_rare_common (reference:
QUILT/R/rare_common.R:109-470): the seek loop converges on common SNPs only;
then one final all-SNP Gibbs runs per chain, whose subset emissions combine
the common-SNP compressed panel with sparse rare-carrier corrections
(rare_per_hap_info), initialized with read labels drawn from the imputed
common haplotype dosages (rare_common.R:61-107).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..io.reads import SampleReads, bq_to_probs, snap_reads_to_grid
from ..utils import print_message


def restrict_reads_to_common(
    reads_all: SampleReads,
    snp_is_common: np.ndarray,
    grid_common: np.ndarray,
) -> SampleReads:
    """Project all-SNP reads onto the common-SNP axis (drop rare bases)."""
    common_new_index = np.cumsum(snp_is_common) - 1
    keep_base = snp_is_common[reads_all.u]
    read_of_base = np.repeat(
        np.arange(reads_all.nReads), np.diff(reads_all.offsets)
    )
    us: List[np.ndarray] = []
    bqs: List[np.ndarray] = []
    for r in range(reads_all.nReads):
        s, e = reads_all.offsets[r], reads_all.offsets[r + 1]
        kb = keep_base[s:e]
        if not kb.any():
            continue
        us.append(common_new_index[reads_all.u[s:e][kb]].astype(np.int32))
        bqs.append(reads_all.bq[s:e][kb])
    reads = SampleReads.from_lists(us, bqs, grid_common)
    return reads.sorted_by_grid()


def build_subset_bits_all(
    rhb_t_common: np.ndarray,        # uint32 [K, nGrids_common]
    which_haps: np.ndarray,          # [B, Ksub]
    snp_is_common: np.ndarray,       # bool [nSNPs_all]
    rare_per_hap_info: List[np.ndarray],
    nGrids_all: int,
) -> np.ndarray:
    """Subset allele matrix over ALL SNPs [B, Ksub, nGrids_all*32]:
    common positions inflated from the packed panel, rare positions set for
    carriers (reference: rare_common.R:1-56 make small eHaps)."""
    from ..utils import unpack_bits_32

    B, Ksub = which_haps.shape
    nSNPs_all = len(snp_is_common)
    S_all = nGrids_all * 32
    common_pos = np.flatnonzero(snp_is_common)
    bits = np.zeros((B, Ksub, S_all), dtype=np.uint8)
    for b in range(B):
        sub_common = unpack_bits_32(
            rhb_t_common[which_haps[b]], int(snp_is_common.sum())
        )
        bits[b, :, common_pos] = sub_common.T
        for i, k in enumerate(which_haps[b]):
            rl = rare_per_hap_info[k]
            if len(rl):
                bits[b, i, rl] = 1
    return bits


def initial_all_snp_labels(
    reads_all: SampleReads,
    hap_dos_common: np.ndarray,      # [n_latent, nSNPs_common]
    snp_is_common: np.ndarray,
    n_latent: int,
    ff: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Draw starting labels for all-SNP reads from P(read | imputed hap)
    with rare positions uninformative (reference: rare_common.R:61-107)."""
    nSNPs_all = len(snp_is_common)
    hap_all = np.full((n_latent, nSNPs_all), 0.5)
    hap_all[:, snp_is_common] = hap_dos_common
    probs = bq_to_probs(reads_all.bq)
    e = hap_all[:, reads_all.u]
    term = e * probs[None, :, 1] + (1 - e) * probs[None, :, 0]
    logterm = np.log(np.maximum(term, 1e-300))
    read_of_base = np.repeat(
        np.arange(reads_all.nReads), np.diff(reads_all.offsets)
    )
    lse = np.zeros((n_latent, reads_all.nReads))
    for h in range(n_latent):
        np.add.at(lse[h], read_of_base, logterm[h])
    lse -= lse.max(axis=0, keepdims=True)
    p = np.exp(lse)
    if n_latent == 3:
        prior = np.array([0.5, (1 - ff) / 2, ff / 2])[:, None]
        p = p * prior
    p = p / p.sum(axis=0, keepdims=True)
    u = rng.random(reads_all.nReads)
    cum = np.cumsum(p, axis=0)
    H = (cum <= u[None, :]).sum(axis=0)
    return np.minimum(H, n_latent - 1).astype(np.int32)
