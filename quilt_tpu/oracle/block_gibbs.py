"""Oracle block-Gibbs escape moves: suffix relabel proposals at
high-recombination boundaries.

Functional equivalent of the reference's (shard) block Gibbs resamplers
(QUILT/src/gibbs-nipt-block.cpp:1636-2355; boundary detection
Rcpp_define_blocked_snps_using_gamma_on_the_fly :311-527): at grid
boundaries where the smoothed recombination rate is high, propose swapping
a pair of latent haplotypes for ALL reads from that grid onward, accepting
with probability proportional to the alpha x beta cross-likelihoods (plus
the label-count prior for NIPT). This escapes phase-switch errors that
single-read moves cannot fix.

For NIPT (n_latent == 3) each boundary proposes among all 6 label
permutations of the suffix, weighted by the forward-backward junction cross
terms times the H_class count likelihood — the block_approach=6 semantics of
Rcpp_consider_block_relabelling (gibbs-nipt-block.cpp:590-954) in suffix
formulation. Diploid keeps the single pairwise swap.

Simplifications vs the reference (documented):
- boundaries come from the smoothed recombination rate quantile only (the
  reference also requires local gamma uncertainty);
- relabelling applies to the whole suffix rather than within-block (two
  suffix relabels compose to a block relabel).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..kernels import nipt


def detect_boundaries(
    smooth_rate: np.ndarray, quantile_prob: float = 0.9,
    max_boundaries: int = 64,
) -> np.ndarray:
    """Grid indices whose incoming recombination rate is above the quantile.

    Boundary b means "suffix starts at grid b" (b >= 1).
    """
    if len(smooth_rate) == 0:
        return np.zeros(0, dtype=np.int64)
    thresh = np.quantile(smooth_rate, quantile_prob)
    b = np.flatnonzero(smooth_rate >= thresh) + 1
    if len(b) > max_boundaries:
        order = np.argsort(-smooth_rate[b - 1], kind="stable")[:max_boundaries]
        b = np.sort(b[order])
    return b.astype(np.int64)


def _pairs(nl: int) -> List[Tuple[int, int]]:
    return [(0, 1)] if nl == 2 else [(0, 1), (0, 2), (1, 2)]


def block_gibbs_resample(
    H: np.ndarray,
    reads,
    eMatRead: np.ndarray,
    eMatGrid: np.ndarray,        # [nl, K, G] (modified in place)
    alpha: np.ndarray,           # [nl, K, G]
    beta: np.ndarray,            # [nl, K, G]
    c: np.ndarray,               # [nl, G]
    trans: np.ndarray,
    prior_probs: np.ndarray,
    n_latent: int,
    smooth_cm: Optional[np.ndarray],
    read_starts: np.ndarray,
    read_ends: np.ndarray,
    uniforms: Optional[np.ndarray],
    quantile_prob: float = 0.9,
    boundaries: Optional[np.ndarray] = None,
    H_class: Optional[np.ndarray] = None,
    ff: float = 0.0,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    G = eMatGrid.shape[2]
    if boundaries is None:
        if smooth_cm is None:
            return H, H_class
        boundaries = detect_boundaries(smooth_cm, quantile_prob)
    pairs = _pairs(n_latent)
    if uniforms is None:
        uniforms = np.full((len(boundaries), len(pairs)), 0.5)
    wif0 = reads.wif0
    H = H.copy()
    if H_class is not None:
        H_class = H_class.copy()
    for jb, b in enumerate(boundaries):
        if b <= 0 or b >= G:
            continue
        if n_latent == 3:
            # 6-permutation suffix relabelling with H_class count term
            # (block_approach=6 of Rcpp_consider_block_relabelling)
            cmat = np.einsum(
                "ik,jk->ij", alpha[:, :, b - 1], beta[:, :, b - 1]
            )
            sfx_r = wif0[: len(H)] >= b
            ns = np.zeros(8, dtype=np.float64)
            if H_class is not None:
                for cc in range(8):
                    ns[cc] = ((H_class == cc) & sfx_r).sum()
            probs = nipt.perm_choice_probs_np(cmat, ns, ff)
            r_idx = nipt.sample_index_np(probs, uniforms[jb, 0])
            if r_idx > 0:
                H[sfx_r] = nipt.PERMS[r_idx][H[sfx_r]]
                if H_class is not None:
                    H_class[sfx_r] = nipt.CLASS_PERM[r_idx][H_class[sfx_r]]
                inv = nipt.INVS[r_idx]
                for arr in (alpha, beta, eMatGrid):
                    arr[:, :, b:] = arr[inv][:, :, b:]
                c[:, b:] = c[inv][:, b:]
            continue
        for pi, (i, j) in enumerate(pairs):
            # decision state: alpha/beta at b-1 (prefix vs future-from-b)
            cross_ii = (alpha[i, :, b - 1] * beta[i, :, b - 1]).sum()
            cross_jj = (alpha[j, :, b - 1] * beta[j, :, b - 1]).sum()
            cross_ij = (alpha[i, :, b - 1] * beta[j, :, b - 1]).sum()
            cross_ji = (alpha[j, :, b - 1] * beta[i, :, b - 1]).sum()
            w_keep = cross_ii * cross_jj
            w_swap = cross_ij * cross_ji
            tot = w_keep + w_swap
            if not np.isfinite(tot) or tot <= 0:
                continue
            if uniforms[jb, pi] < w_swap / tot:
                sfx_r = wif0[: len(H)] >= b
                Hi = H == i
                Hj = H == j
                H[Hi & sfx_r] = j
                H[Hj & sfx_r] = i
                for arr in (alpha, beta, eMatGrid):
                    tmp = arr[i, :, b:].copy()
                    arr[i, :, b:] = arr[j, :, b:]
                    arr[j, :, b:] = tmp
                tmp = c[i, b:].copy()
                c[i, b:] = c[j, b:]
                c[j, b:] = tmp
    return H, H_class
