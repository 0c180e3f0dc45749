"""Oracle full-panel haploid forward-backward with fused dosage and top-K.

Mirrors R_haploid_dosage_versus_refs (reference:
QUILT/R/reference-single.R:94-372 and the C++ Rcpp_haploid_dosage_versus_refs,
QUILT/src/reference-single.cpp:2189-2413): a haploid Li & Stephens HMM of one
sample haplotype against all K panel haplotypes, using the distinct-haplotype
compressed emissions, producing per-SNP allele dosages and the top-K matching
haplotypes at thinned grids.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..panel.prepare import CompressedPanel
from .emissions import build_emat_dh, emission_for_word


@dataclass
class FBResult:
    dosage: np.ndarray                 # [nSNPs]
    log_like: float                    # log P(O | panel)
    top_matches: Optional[List[np.ndarray]]         # per thinned grid: hap idx
    top_values: Optional[List[np.ndarray]]          # per thinned grid: gamma
    gamma: Optional[np.ndarray] = None              # [K, nGrids] if requested


def haploid_dosage_versus_refs(
    gl: np.ndarray,
    panel: CompressedPanel,
    trans: np.ndarray,
    ref_error: float = 0.001,
    thinned_grids: Optional[np.ndarray] = None,
    K_top_matches: int = 5,
    return_gamma: bool = False,
) -> FBResult:
    """Run the full-panel haploid FB.

    gl: [2, nSNPs] haploid genotype likelihoods.
    trans: [2, nGrids-1] (stay, jump) pairs.
    thinned_grids: grid indices at which to extract top-K matches.
    """
    K, nGrids, nSNPs = panel.K, panel.nGrids, panel.nSNPs
    nMaxDH = panel.nMaxDH
    eMatDH = build_emat_dh(panel.distinctHapsB, gl, nSNPs, ref_error)
    # escape emissions: for (grid, k) pairs not matched by hapMatcher
    esc_e = np.zeros(len(panel.esc_k), dtype=np.float64)
    for i in range(len(panel.esc_k)):
        g = panel.esc_grid[i]
        s = 32 * g
        n = min(32, nSNPs - s)
        esc_e[i] = emission_for_word(panel.esc_word[i], gl, s, n, ref_error)

    def emissions_at(g: int) -> np.ndarray:
        dh = panel.hapMatcher[:, g].astype(np.int64)
        e = np.where(dh > 0, eMatDH[np.maximum(dh - 1, 0), g], 0.0)
        w = panel.esc_grid == g
        if w.any():
            e[panel.esc_k[w]] = esc_e[w]
        return e

    alpha = np.zeros((K, nGrids), dtype=np.float64)
    c = np.zeros(nGrids, dtype=np.float64)
    e0 = emissions_at(0)
    alpha[:, 0] = e0 / K
    c[0] = 1.0 / alpha[:, 0].sum()
    alpha[:, 0] *= c[0]
    for g in range(1, nGrids):
        stay, jump = trans[0, g - 1], trans[1, g - 1]
        e = emissions_at(g)
        alpha[:, g] = (jump / K + stay * alpha[:, g - 1]) * e
        c[g] = 1.0 / alpha[:, g].sum()
        alpha[:, g] *= c[g]

    dosage = np.zeros(nSNPs, dtype=np.float64)
    gamma_store = np.zeros((K, nGrids), dtype=np.float64) if return_gamma else None
    top_matches: Optional[List[np.ndarray]] = None
    top_values: Optional[List[np.ndarray]] = None
    if thinned_grids is not None:
        top_matches = [np.zeros(0, dtype=np.int64)] * len(thinned_grids)
        top_values = [np.zeros(0)] * len(thinned_grids)
        thin_pos = {int(g): i for i, g in enumerate(thinned_grids)}
    else:
        thin_pos = {}

    beta_col = np.ones(K, dtype=np.float64)
    for g in range(nGrids - 1, -1, -1):
        if g < nGrids - 1:
            stay, jump = trans[0, g], trans[1, g]
            e_next = emissions_at(g + 1)
            etb = e_next * beta_col
            beta_col = stay * etb + jump * etb.sum() / K
        gamma_col = alpha[:, g] * beta_col
        gamma_col = gamma_col / gamma_col.sum()
        if return_gamma:
            gamma_store[:, g] = gamma_col
        if g in thin_pos:
            kt = min(K_top_matches, K)
            thresh = np.partition(gamma_col, K - kt)[K - kt]
            sel = np.flatnonzero(gamma_col >= thresh)
            sel = sel[np.argsort(-gamma_col[sel], kind="stable")]
            top_matches[thin_pos[g]] = sel
            top_values[thin_pos[g]] = gamma_col[sel]
        # dosage for this grid's SNPs
        s = 32 * g
        e_end = min(32 * (g + 1), nSNPs)
        dh = panel.hapMatcher[:, g].astype(np.int64)
        matched = np.zeros(nMaxDH, dtype=np.float64)
        np.add.at(matched, np.maximum(dh - 1, 0), np.where(dh > 0, gamma_col, 0.0))
        dosage[s:e_end] = matched @ panel.distinctHapsIE[:, s:e_end]
        w = panel.esc_grid == g
        if w.any():
            for i in np.flatnonzero(w):
                k = panel.esc_k[i]
                n = e_end - s
                bits = (np.uint32(panel.esc_word[i]) >> np.arange(n, dtype=np.uint32)) & 1
                eh = np.where(bits == 1, 1.0 - ref_error, ref_error)
                dosage[s:e_end] += gamma_col[k] * eh
        beta_col = beta_col * c[g]
    return FBResult(
        dosage=dosage,
        log_like=-float(np.log(c).sum()),
        top_matches=top_matches,
        top_values=top_values,
        gamma=gamma_store,
    )
