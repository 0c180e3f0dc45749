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
- the non-"within" suffix move set applies relabelling to the whole
  suffix rather than within-block (two suffix relabels compose to a
  block relabel); the production NIPT path uses the within-block set.
Since round 4, boundary detection matches the reference's production
behavior: on-the-fly from the live FB jump rate (live_jump_rate +
boundaries_from_rate below), not the static map quantile.
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

    Boundary b means "suffix starts at grid b" (b >= 1). This is the
    STATIC map-based detection (block_gibbs_boundary_detection="map");
    the production "gamma" mode detects boundaries on the fly from the
    live FB state — see live_jump_rate / boundaries_from_rate below.
    """
    if len(smooth_rate) == 0:
        return np.zeros(0, dtype=np.int64)
    thresh = np.quantile(smooth_rate, quantile_prob)
    b = np.flatnonzero(smooth_rate >= thresh) + 1
    if len(b) > max_boundaries:
        from ..utils import print_message
        print_message(
            f"block-Gibbs boundary cap: keeping the top {max_boundaries} "
            f"of {len(b)} above-quantile boundaries"
        )
        order = np.argsort(-smooth_rate[b - 1], kind="stable")[:max_boundaries]
        b = np.sort(b[order])
    return b.astype(np.int64)


def live_jump_rate(
    alpha: np.ndarray,           # [nl, K, G] (latent-major FB planes)
    beta: np.ndarray,            # [nl, K, G]
    emg: np.ndarray,             # [nl, K, G] emission per grid
    trans: np.ndarray,           # [2, G-1] (stay, jump) per gap
    include3: bool = True,
) -> np.ndarray:
    """[G-1] posterior jump rate per grid gap from the live FB state:
    rate2 of Rcpp_define_blocked_snps_using_gamma_on_the_fly (reference:
    QUILT/src/gibbs-nipt-block.cpp:348-365), in normalization-invariant
    form — P(jump at gap g | O) from the exact stay/jump decomposition of
    alpha(g+1) — so it is independent of the alpha/beta scaling
    convention. The final gap stays 0 (the reference loop bound)."""
    nl, K, G = alpha.shape
    n_lat = nl if include3 else min(nl, 2)
    rate2 = np.zeros(G - 1)
    for i in range(n_lat):
        eb = emg[i] * beta[i]                          # [K, G]
        n1 = (alpha[i][:, :-1] * eb[:, 1:]).sum(axis=0)
        n2 = alpha[i][:, :-1].sum(axis=0) * eb[:, 1:].sum(axis=0) / K
        t0, t1 = trans[0], trans[1]
        denom = t0 * n1 + t1 * n2
        njf = np.where(denom > 0, t0 * n1 / np.maximum(denom, 1e-300), 1.0)
        rate2 += 1.0 - njf
    rate2[-1] = 0.0
    return rate2


def greedy_peak_boundaries(smoothed: np.ndarray, thresh: float) -> np.ndarray:
    """FAITHFUL port of the reference's greedy descending-peak loop
    (Rcpp_define_blocked_snps_using_gamma_on_the_fly, reference:
    QUILT/src/gibbs-nipt-block.cpp:400-481): take above-threshold gaps in
    descending smoothed-rate order; a peak whose 3-neighborhood is fully
    available (d == 3) consumes its whole run
    (rcpp_determine_where_to_stop left+right); a peak at a run edge
    (d < 3) consumes only its ±1 neighborhood, so the rest of the run
    stays eligible and lower peaks in the same run are also kept (the
    cascade emits up to every other gap of an edge-peaked run). Returns
    ascending suffix-start indices (gap index + 1), uncapped."""
    Gm = len(smoothed)
    avail = smoothed > thresh
    order = np.argsort(-smoothed, kind="stable")
    keep = []
    for s in order:
        if not avail[s]:
            continue
        a, b = max(s - 1, 0), min(s + 1, Gm - 1)
        if int(avail[a:b + 1].sum()) == 3:
            left = s
            while left - 1 >= 0 and avail[left - 1]:
                left -= 1
            right = s
            while right + 1 < Gm and avail[right + 1]:
                right += 1
            avail[left:right + 1] = False
        else:
            avail[a:b + 1] = False
        keep.append(s + 1)
    return np.array(sorted(keep), dtype=np.int64)


def boundaries_from_rate(
    rate2: np.ndarray,           # [G-1]
    smooth_w,                    # (band, idx0) from prepare.smoothing_band
    max_boundaries: int = 32,
    quantile_prob: float = 0.95,
) -> np.ndarray:
    """NumPy mirror of kernels.gibbs._boundaries_from_rate (one row).

    Mirrors Rcpp_define_blocked_snps_using_gamma_on_the_fly (reference:
    QUILT/src/gibbs-nipt-block.cpp:366-500): smooth over physical
    distance, threshold at min(1, sorted[int(n*q)]) (rcpp_simple_quantile,
    :81-85), then the faithful greedy peak loop (greedy_peak_boundaries).
    Deviation from the reference (shared with the device kernel, whose
    second pass covers one cascade step): the count is capped at
    max_boundaries (top by smoothed rate), logged when it truncates; the
    engine auto-raises the cap to the static-map run estimate.
    Returns ascending suffix-start indices (no pads)."""
    Gm = len(rate2)
    band, idx0 = smooth_w
    bw = band.shape[1]
    gidx = np.clip(
        idx0[:, None].astype(np.int64) + np.arange(bw)[None, :], 0, Gm - 1
    )
    smoothed = (band * rate2[gidx]).sum(axis=1)
    v = min(int(Gm * quantile_prob), Gm - 1)
    thresh = min(1.0, np.sort(smoothed)[v])
    keep = greedy_peak_boundaries(smoothed, thresh)
    if len(keep) > max_boundaries:
        from ..utils import print_message
        print_message(
            f"block-Gibbs boundary cap: keeping the top {max_boundaries} "
            f"of {len(keep)} run peaks"
        )
        order = np.argsort(-smoothed[keep - 1], kind="stable")
        keep = np.sort(keep[order[:max_boundaries]])
    return keep.astype(np.int64)


def _pairs(nl: int) -> List[Tuple[int, int]]:
    return [(0, 1)] if nl == 2 else [(0, 1), (0, 2), (1, 2)]


def block_ranges(boundaries: np.ndarray, G: int):
    """Inclusive [start, end] block ranges from suffix-start boundaries."""
    b = np.asarray([x for x in boundaries if 0 < x < G], dtype=np.int64)
    starts = np.concatenate([[0], b])
    ends = np.concatenate([b - 1, [G - 1]])
    return starts, ends


def class_label_probs(ff: float) -> np.ndarray:
    """[8, 3] P(label | H_class): the sampling table of
    rcpp_sample_H_using_H_class (gibbs-nipt-block.cpp:213-248)."""
    p = np.array([0.5, 0.5 - ff * 0.5, ff * 0.5])
    t = np.zeros((8, 3))
    t[0] = p
    t[7] = p
    t[1] = (1, 0, 0)
    t[2] = (0, 1, 0)
    t[3] = (0, 0, 1)
    t[4] = (p[0], p[1], 0)
    t[5] = (p[0], 0, p[2])
    t[6] = (0, p[1], p[2])
    s = t.sum(axis=1, keepdims=True)
    return t / np.where(s > 0, s, 1.0)


def sample_H_using_H_class(
    H_class: np.ndarray, uniforms: np.ndarray, ff: float
) -> np.ndarray:
    """Resample read labels from their class-conditional distribution
    (rcpp_sample_H_using_H_class, gibbs-nipt-block.cpp:213-248)."""
    t = class_label_probs(ff)
    cdf = np.cumsum(t[H_class], axis=-1)            # [R, 3]
    return (uniforms[:, None] >= cdf).sum(axis=-1).clip(0, 2).astype(np.int64)


def block_gibbs_within(
    H: np.ndarray,
    H_class: np.ndarray,
    reads,
    eMatRead: np.ndarray,        # [K, R]
    eMatGrid: np.ndarray,        # [3, K, G] (updated in place)
    alpha: np.ndarray,           # [3, K, G] (updated in place)
    beta: np.ndarray,            # [3, K, G] (updated in place)
    c: np.ndarray,               # [3, G] (updated in place)
    trans: np.ndarray,           # [2, G-1]
    ff: float,
    boundaries: np.ndarray,
    uniforms_block: np.ndarray,  # [n_blocks]
    uniforms_H: Optional[np.ndarray] = None,   # [R] for the final resample
    resample_H: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """WITHIN-block 6-permutation relabelling + final H resample from
    H_class: the NIPT production move set of Rcpp_block_gibbs_resampler
    with block_approach=6 and resample_H_using_H_class=TRUE
    (gibbs-nipt-block.cpp:1636-1974; per-block decision
    Rcpp_consider_block_relabelling :590-954). Blocks are processed
    sequentially; each decision compares, for every relabelling ir, the
    in-block forward restarted from the entering alpha under row-permuted
    emissions against the (stale) beta at the block end, plus the H_class
    count likelihood of the block's reads, then re-runs the in-block
    forward under the accepted relabelling so the next block sees a
    consistent entering state. The final backward re-run restores beta."""
    nl, K, G = eMatGrid.shape
    assert nl == 3
    wif0 = reads.wif0[: len(H)]
    clp = nipt.class_log_p(ff)
    starts, ends = block_ranges(boundaries, G)
    H = H.copy()
    H_class = H_class.copy()

    def fwd_span(i_src: int, i_dst: int, gs: int, ge: int):
        """Forward for (new) hap i_dst over [gs, ge] using hap i_src's
        emissions; returns (alpha at ge normalized, sum log c inside,
        trajectory, per-grid c)."""
        traj = np.empty((ge - gs + 1, K))
        traj_c = np.empty(ge - gs + 1)
        logc = 0.0
        for g in range(gs, ge + 1):
            if g == 0:
                a = eMatGrid[i_src, :, 0] / K
            elif g == gs:
                a = eMatGrid[i_src, :, g] * (
                    trans[0, g - 1] * alpha[i_dst, :, g - 1]
                    + trans[1, g - 1] / K
                )
            else:
                a = eMatGrid[i_src, :, g] * (
                    trans[0, g - 1] * a + trans[1, g - 1] / K
                )
            cc = 1.0 / a.sum()
            a = a * cc
            logc += np.log(cc)
            traj[g - gs] = a
            traj_c[g - gs] = cc
        return a, logc, traj, traj_c

    for jb in range(len(starts)):
        gs, ge = int(starts[jb]), int(ends[jb])
        lw = np.zeros(6)
        finals = {}
        for ir in range(6):
            for i in range(3):
                src = int(nipt.INVS[ir, i])
                a_end, logc_in, _t, _tc = fwd_span(src, i, gs, ge)
                finals[(ir, i)] = a_end
                lw[ir] += np.log(
                    max((a_end * beta[i, :, ge]).sum(), 1e-300)
                ) - logc_in
        in_blk = (wif0 >= gs) & (wif0 <= ge)
        ns = np.array([((H_class == cc) & in_blk).sum() for cc in range(8)],
                      dtype=np.float64)
        for ir in range(6):
            for cc in range(1, 7):
                lw[ir] += ns[nipt.CLASS_PERM[ir, cc]] * clp[cc]
        lw -= lw.max()
        lw = np.clip(lw, -100.0, None)
        w = np.exp(lw)
        if ff <= 0.0:
            w[[1, 3, 4, 5]] = 0.0
        w = w / w.sum()
        r_idx = nipt.sample_index_np(w, uniforms_block[jb])
        if r_idx > 0:
            H[in_blk] = nipt.PERMS[r_idx][H[in_blk]]
            H_class[in_blk] = nipt.CLASS_PERM[r_idx][H_class[in_blk]]
            inv = nipt.INVS[r_idx]
            eMatGrid[:, :, gs:ge + 1] = eMatGrid[inv][:, :, gs:ge + 1]
        # re-run the in-block forward under the accepted labels so the
        # next block's entering alpha is consistent (reference :850-925)
        for i in range(3):
            _a, _lc, traj, traj_c = fwd_span(i, i, gs, ge)
            alpha[i, :, gs:ge + 1] = traj.T
            c[i, gs:ge + 1] = traj_c

    if resample_H and ff > 0.0:
        if uniforms_H is None:
            uniforms_H = np.full(len(H), 0.5)
        H = sample_H_using_H_class(H_class, uniforms_H, ff)
        # rebuild eMatGrid + full forward (reference :1900-1942)
        eMatGrid[:] = 1.0
        for r in range(len(H)):
            eMatGrid[H[r], :, wif0[r]] *= eMatRead[:, r]
        for i in range(3):
            a = None
            for g in range(G):
                if g == 0:
                    raw = eMatGrid[i, :, 0] / K
                else:
                    raw = eMatGrid[i, :, g] * (
                        trans[0, g - 1] * a + trans[1, g - 1] / K
                    )
                c[i, g] = 1.0 / raw.sum()
                a = raw * c[i, g]
                alpha[i, :, g] = a
    # final backward re-run (reference :1945-1965)
    for i in range(3):
        beta[i, :, G - 1] = c[i, G - 1]
        for g in range(G - 2, -1, -1):
            etb = eMatGrid[i, :, g + 1] * beta[i, :, g + 1]
            beta[i, :, g] = c[i, g] * (
                trans[0, g] * etb + trans[1, g] * etb.mean()
            )
    return H, H_class


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
