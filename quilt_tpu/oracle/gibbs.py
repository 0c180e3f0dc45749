"""Oracle per-read Gibbs sampler over a small haplotype subset.

Mirrors forwardBackwardGibbsNIPT and its helpers (reference:
QUILT/R/gibbs-nipt.R:4-995, C++ core QUILT/src/gibbs-nipt.cpp:2395-3318):
two (diploid) or three (NIPT) coupled haploid Li & Stephens HMMs whose
emissions are products of per-read emissions, with a forward grid sweep that
Gibbs-resamples each read's latent-haplotype label in its central grid using
alpha*beta read-removal probabilities, followed by a backward pass; repeated
for n_burn_in + n_sample iterations.

Conventions (0-based throughout, unlike the R):
- labels H in {0..n_latent-1}
- uniforms[it, r] drives the resampling decision of read r at iteration it,
  matching the reference's runif_reads indexing (gibbs-nipt.R:188,726).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..io.reads import SampleReads
from ..kernels import nipt
from .emissions import make_emat_read

READ_CAT_NORMAL = 0
READ_CAT_SKIP = 1


@dataclass
class GibbsResult:
    genProbs: np.ndarray        # [3, nSNPs] (maternal for nipt)
    genProbsF: Optional[np.ndarray]  # [3, nSNPs] fetal (nipt only)
    hapProbs: np.ndarray        # [n_latent, nSNPs]
    H: np.ndarray               # [nReads] final labels
    per_it_likelihoods: np.ndarray   # [n_its, 8] (kernels.gibbs.PER_IT_COLS)
    eMatRead: np.ndarray        # [K, nReads]
    underflow: bool
    gammas: Optional[List[np.ndarray]] = None  # per latent hap [K, nGrids]
    H_class: Optional[np.ndarray] = None       # [nReads] NIPT read classes


def classify_reads(eMatRead: np.ndarray) -> np.ndarray:
    """Read triage: 1 = uninformative (all entries ~1, skip resampling),
    0 = informative. Mirrors evaluate_read_variability's skip category
    (reference: gibbs-nipt.R:2016-2064); the reference's categories 2/3 are
    CPU micro-optimizations of the same arithmetic and are not distinguished
    here."""
    # range test, not a 1-1e-12 threshold: near 1.0 that threshold
    # rounds to 1.0 in float32, so the device paths would never skip;
    # the subtraction is exact in either precision and all paths agree
    rng_k = eMatRead.max(axis=0) - eMatRead.min(axis=0)
    return np.where(
        rng_k <= 1e-9, READ_CAT_SKIP, READ_CAT_NORMAL
    ).astype(np.int32)


def gibbs_sample_one_chain(
    reads: SampleReads,
    hap_alleles: np.ndarray,
    grid: np.ndarray,
    trans: np.ndarray,
    n_latent: int,
    ff: float,
    uniforms: np.ndarray,
    H_init: np.ndarray,
    nGrids: int,
    iterative_init: bool = True,
    first_read_init: int = 0,
    n_burn_in_its: int = 20,
    n_sample_its: int = 1,
    ref_error: float = 0.001,
    maxDifferenceBetweenReads: float = 1e10,
    block_gibbs_iterations: Optional[List[int]] = None,
    smooth_cm: Optional[np.ndarray] = None,
    block_uniforms: Optional[np.ndarray] = None,
    shard_uniforms: Optional[np.ndarray] = None,
    block_gibbs_quantile_prob: float = 0.9,
    return_gammas: bool = False,
    eMatRead: Optional[np.ndarray] = None,
    relabel_uniforms: Optional[np.ndarray] = None,   # [n_its] entire-relabel
    do_entire_relabelling: bool = False,
    block_within: bool = False,
    resample_uniforms: Optional[np.ndarray] = None,  # [n_its, R]
) -> GibbsResult:
    K, nSNPs = hap_alleles.shape
    nReads = reads.nReads
    if n_latent == 2:
        prior_probs = np.array([0.5, 0.5])
    else:
        prior_probs = np.array([0.5, (1 - ff) / 2.0, ff / 2.0])
    if eMatRead is None:
        eMatRead = make_emat_read(
            reads, hap_alleles, ref_error, maxDifferenceBetweenReads
        )
    read_cat = classify_reads(eMatRead)
    e_inflated = np.where(hap_alleles == 1, 1.0 - ref_error, ref_error)

    H = H_init.copy().astype(np.int64)
    n_its = n_burn_in_its + n_sample_its
    # emissions per grid per latent hap
    eMatGrid = np.ones((n_latent, K, nGrids), dtype=np.float64)
    if not iterative_init:
        for r in range(nReads):
            eMatGrid[H[r], :, reads.wif0[r]] *= eMatRead[:, r]
    alpha = np.ones((n_latent, K, nGrids), dtype=np.float64)
    beta = np.ones((n_latent, K, nGrids), dtype=np.float64)
    c = np.ones((n_latent, nGrids), dtype=np.float64)

    def forward_full(h: int) -> None:
        alpha[h, :, 0] = eMatGrid[h, :, 0] / K
        c[h, 0] = 1.0 / alpha[h, :, 0].sum()
        alpha[h, :, 0] *= c[h, 0]
        for g in range(1, nGrids):
            stay, jump = trans[0, g - 1], trans[1, g - 1]
            alpha[h, :, g] = eMatGrid[h, :, g] * (
                stay * alpha[h, :, g - 1] + jump / K
            )
            c[h, g] = 1.0 / alpha[h, :, g].sum()
            alpha[h, :, g] *= c[h, g]

    def backward_full(h: int) -> None:
        beta[h, :, nGrids - 1] = c[h, nGrids - 1]
        for g in range(nGrids - 2, -1, -1):
            stay, jump = trans[0, g], trans[1, g]
            etb = eMatGrid[h, :, g + 1] * beta[h, :, g + 1]
            beta[h, :, g] = c[h, g] * (stay * etb + jump * etb.mean())

    if iterative_init:
        # alpha/beta start as the uninformative HMM; eMatGrid all ones;
        # reads get sequentially assigned during iterations 1-2
        # (reference: gibbs-nipt.R:203-224, 624-695)
        for h in range(n_latent):
            alpha[h, :, 0] = 1.0 / K
            c[h, 0] = 1.0
    else:
        for h in range(n_latent):
            forward_full(h)
            backward_full(h)

    # reads grouped by central grid (reads must be sorted by wif0)
    assert (np.diff(reads.wif0) >= 0).all(), "reads must be sorted by grid"
    read_starts = np.searchsorted(reads.wif0, np.arange(nGrids), side="left")
    read_ends = np.searchsorted(reads.wif0, np.arange(nGrids), side="right")

    per_it_ll = np.zeros((n_its, 8), dtype=np.float64)
    underflow = False
    genProbs_acc = None
    result = None
    H_class = np.zeros(nReads, dtype=np.int32)
    rlc = nipt.make_rlc(ff) if n_latent == 3 else None

    def compute_H_class() -> np.ndarray:
        """Batched NIPT read classification from the end-of-iteration state
        (mirrors kernels/gibbs.py compute_Hclass; see kernels/nipt.py for
        the mid-sweep-vs-end-of-iteration deviation note)."""
        hc = np.zeros(nReads, dtype=np.int32)
        for r in range(nReads):
            if read_cat[r] == READ_CAT_SKIP:
                continue
            g = reads.wif0[r]
            am, bm = alpha[:, :, g], beta[:, :, g]
            em = eMatRead[:, r]
            gain = np.array([(am[h] * bm[h] * em).sum() for h in range(3)])
            pC = (am * bm).sum(axis=1)
            C = int(H[r])
            lose_C = (am[C] * bm[C] / em).sum()
            hc[r] = nipt.classify_read_np(gain, lose_C, pC, C, prior_probs,
                                          rlc)
        return hc

    for it in range(n_its):
        for g in range(nGrids):
            if g == 0:
                for h in range(n_latent):
                    alpha[h, :, 0] = eMatGrid[h, :, 0] / K
                    ssum = alpha[h, :, 0].sum()
                    c[h, 0] = 1.0 / ssum
                    alpha[h, :, 0] *= c[h, 0]
            else:
                stay, jump = trans[0, g - 1], trans[1, g - 1]
                for h in range(n_latent):
                    alpha[h, :, g] = eMatGrid[h, :, g] * (
                        stay * alpha[h, :, g - 1] + jump / K
                    )
                    ssum = alpha[h, :, g].sum()
                    if not np.isfinite(ssum) or ssum <= 0:
                        underflow = True
                        ssum = 1.0
                    c[h, g] = 1.0 / ssum
                    alpha[h, :, g] *= c[h, g]
            alpha_m = alpha[:, :, g]        # view [n_latent, K]
            beta_m = beta[:, :, g]
            pC = (alpha_m * beta_m).sum(axis=1)
            for r in range(read_starts[g], read_ends[g]):
                if read_cat[r] == READ_CAT_SKIP:
                    continue
                # decide work type (iterative initialization schedule,
                # reference: gibbs-nipt.R:624-636)
                doing_init = False
                doing_pass = False
                if iterative_init:
                    if it == 0 and r < first_read_init:
                        doing_pass = True
                    elif it == 0 and r >= first_read_init:
                        doing_init = True
                    elif it == 1 and r < first_read_init:
                        doing_init = True
                if doing_pass:
                    continue
                em = eMatRead[:, r]
                if doing_init:
                    h_rC = 0
                    alts = list(range(1, n_latent))
                    p_opts = np.tile(pC, (n_latent, 1))
                    for h in range(n_latent):
                        p_opts[h, h] = (alpha_m[h] * beta_m[h] * em).sum()
                else:
                    h_rC = int(H[r])
                    alts = [h for h in range(n_latent) if h != h_rC]
                    p_opts = np.tile(pC, (n_latent, 1))
                    lose = (alpha_m[h_rC] * beta_m[h_rC] / em).sum()
                    for h in alts:
                        p_opts[h, h_rC] = lose
                        p_opts[h, h] = (alpha_m[h] * beta_m[h] * em).sum()
                w = np.prod(p_opts, axis=1) * prior_probs
                denom = w.sum()
                if denom <= 0 or not np.isfinite(denom):
                    underflow = True
                    continue
                probs = w / denom
                cum = np.cumsum(probs)
                chance = uniforms[it, r]
                h_rN = int(np.searchsorted(cum, chance, side="right"))
                h_rN = min(h_rN, n_latent - 1)
                if (h_rN != h_rC) or doing_init:
                    H[r] = h_rN
                    if not doing_init:
                        alpha_m[h_rC] /= em
                        eMatGrid[h_rC, :, g] /= em
                    alpha_m[h_rN] *= em
                    eMatGrid[h_rN, :, g] *= em
                    pC = p_opts[h_rN].copy()
                # numerical guard (reference: gibbs-nipt.R:808-836)
                if (pC > 1e50).any() or (pC < 1e-50).any():
                    for h in range(n_latent):
                        ssum = alpha_m[h].sum()
                        c[h, g] *= 1.0 / ssum
                        alpha_m[h] /= ssum
                    pC = (alpha_m * beta_m).sum(axis=1)
            # inject back / renormalize after the grid's reads
            for h in range(n_latent):
                ssum = alpha_m[h].sum()
                if not np.isfinite(ssum) or ssum <= 0:
                    underflow = True
                    ssum = 1.0
                c[h, g] *= 1.0 / ssum
                alpha_m[h] /= ssum
        # backward pass with updated emissions
        for h in range(n_latent):
            backward_full(h)
        # H_class from the end-of-iteration state (kernel-mirroring
        # schedule: block iterations, final iteration, entire-relabelling)
        is_block_it = bool(
            block_gibbs_iterations and (it + 1) in block_gibbs_iterations
        )
        if n_latent == 3 and (
            is_block_it or it == n_its - 1 or do_entire_relabelling
        ):
            H_class = compute_H_class()
        # optional block-Gibbs escape moves
        if is_block_it and block_within and n_latent == 3:
            # production move set: within-block relabelling + H resample
            # (Rcpp_block_gibbs_resampler, block_approach=6)
            from .block_gibbs import block_gibbs_within, detect_boundaries
            i_block = list(block_gibbs_iterations).index(it + 1)
            bu = block_uniforms[i_block]
            bnd = detect_boundaries(smooth_cm, block_gibbs_quantile_prob)
            u_blocks = np.concatenate([bu[:, 0], bu[-1:, 1]])
            ru = (resample_uniforms[it]
                  if resample_uniforms is not None else None)
            H, H_class = block_gibbs_within(
                H=H, H_class=H_class, reads=reads, eMatRead=eMatRead,
                eMatGrid=eMatGrid, alpha=alpha, beta=beta, c=c, trans=trans,
                ff=ff, boundaries=bnd, uniforms_block=u_blocks,
                uniforms_H=ru, resample_H=ru is not None,
            )
        elif is_block_it:
            from .block_gibbs import block_gibbs_resample
            i_block = list(block_gibbs_iterations).index(it + 1)
            bu = block_uniforms[i_block] if block_uniforms is not None else None
            H, H_class = block_gibbs_resample(
                H=H,
                reads=reads,
                eMatRead=eMatRead,
                eMatGrid=eMatGrid,
                alpha=alpha,
                beta=beta,
                c=c,
                trans=trans,
                prior_probs=prior_probs,
                n_latent=n_latent,
                smooth_cm=smooth_cm,
                read_starts=read_starts,
                read_ends=read_ends,
                uniforms=bu,
                quantile_prob=block_gibbs_quantile_prob,
                H_class=H_class,
                ff=ff,
            )
        relabel = 1
        if do_entire_relabelling and n_latent == 3:
            # entire relabelling (rcpp_consider_and_try_entire_relabelling,
            # gibbs-nipt.cpp:1553-1577)
            rc = np.array([(H == i).sum() for i in range(3)])
            probs = nipt.entire_relabel_probs_np(rc, ff)
            u_rel = (
                relabel_uniforms[it] if relabel_uniforms is not None else 0.0
            )
            r_idx = nipt.sample_index_np(probs, u_rel)
            if r_idx > 0:
                H = nipt.PERMS[r_idx][H]
                H_class = nipt.CLASS_PERM[r_idx][H_class]
                inv = nipt.INVS[r_idx]
                for arr in (alpha, beta, eMatGrid):
                    arr[...] = arr[inv]
                c[...] = c[inv]
            relabel = r_idx + 1
        # likelihood logging (reference: gibbs-nipt.R:1441-1471; columns
        # match kernels.gibbs.PER_IT_COLS)
        p_O_h = -np.log(c[:n_latent]).sum(axis=1)
        p_O = p_O_h.sum()
        p_H = np.log(prior_probs[H]).sum()
        rc_l = np.array([(H == i).sum() for i in range(n_latent)])
        p_set = nipt.log_dmultinom_np(rc_l, prior_probs)
        p_O3 = p_O_h[2] if n_latent == 3 else 0.0
        per_it_ll[it] = (
            p_O_h[0], p_O_h[1], p_O3, p_O, p_H, p_O + p_H, p_set, relabel,
        )
        if it >= n_burn_in_its:
            gammas = [
                alpha[h] * beta[h] / c[h][None, :] for h in range(n_latent)
            ]
            hap_dos = np.stack([
                np.einsum("ks,ks->s", gammas[h][:, grid], e_inflated)
                for h in range(n_latent)
            ])
            gp = np.stack([
                (1 - hap_dos[0]) * (1 - hap_dos[1]),
                hap_dos[0] * (1 - hap_dos[1]) + (1 - hap_dos[0]) * hap_dos[1],
                hap_dos[0] * hap_dos[1],
            ])
            gpF = None
            if n_latent == 3:
                gpF = np.stack([
                    (1 - hap_dos[0]) * (1 - hap_dos[2]),
                    hap_dos[0] * (1 - hap_dos[2]) + (1 - hap_dos[0]) * hap_dos[2],
                    hap_dos[0] * hap_dos[2],
                ])
            if genProbs_acc is None:
                genProbs_acc = gp
                genProbsF_acc = gpF
                hapProbs_acc = hap_dos
                n_acc = 1
            else:
                genProbs_acc = genProbs_acc + gp
                if gpF is not None:
                    genProbsF_acc = genProbsF_acc + gpF
                hapProbs_acc = hapProbs_acc + hap_dos
                n_acc += 1
    genProbs = genProbs_acc / n_acc
    genProbsF = genProbsF_acc / n_acc if n_latent == 3 else None
    hapProbs = hapProbs_acc / n_acc
    result = GibbsResult(
        genProbs=genProbs,
        genProbsF=genProbsF,
        hapProbs=hapProbs,
        H=H,
        per_it_likelihoods=per_it_ll,
        eMatRead=eMatRead,
        underflow=underflow,
        gammas=[alpha[h] * beta[h] / c[h][None, :] for h in range(n_latent)]
        if return_gammas
        else None,
        H_class=H_class,
    )
    return result
