"""Oracle emission computations.

- make_emat_read: P(read | hap k) over a hap subset
  (reference: QUILT/src/copied-from-stitch.cpp:115-233 rcpp_make_eMatRead_t,
   QUILT/R/gibbs-small.R:1-68).
- make_gl_from_reads: haploid genotype likelihoods from a set of reads
  (reference: QUILT/R/reference-single.R:19-42 make_gl_from_u_bq).
- build_emat_dh: per-grid emission of each distinct haplotype vs the GLs
  (reference: QUILT/R/reference-single.R:45-73 build_eMatDH).
"""
from __future__ import annotations

import numpy as np

from ..io.reads import SampleReads, bq_to_probs


def make_emat_read(
    reads: SampleReads,
    hap_alleles: np.ndarray,
    ref_error: float = 0.001,
    maxDifferenceBetweenReads: float = 1e10,
    rescale: bool = True,
    Jmax: int = 10000,
) -> np.ndarray:
    """eMatRead [K, nReads]: P(read r | copied hap k), rescaled per read.

    hap_alleles is [K, nSNPs] in {0,1}. Alleles are inflated to expected
    dosages e in {ref_error, 1-ref_error}; per base with probs (pR, pA),
    the factor is e*pA + (1-e)*pR. After the product over bases, each read
    column is divided by its max and floored at 1/maxDifferenceBetweenReads.
    """
    K, _ = hap_alleles.shape
    nReads = reads.nReads
    e = np.where(hap_alleles == 1, 1.0 - ref_error, ref_error)
    out = np.ones((K, nReads), dtype=np.float64)
    probs = bq_to_probs(reads.bq)
    for r in range(nReads):
        s, t = reads.offsets[r], reads.offsets[r + 1]
        n = min(t - s, Jmax + 1)
        for j in range(n):
            jj = reads.u[s + j]
            pR, pA = probs[s + j]
            out[:, r] *= e[:, jj] * pA + (1.0 - e[:, jj]) * pR
        if rescale:
            x = out[:, r].max()
            if not np.isfinite(x) or x == 0.0:
                out[:, r] = 1.0
            else:
                out[:, r] /= x
                out[:, r] = np.maximum(out[:, r], 1.0 / maxDifferenceBetweenReads)
    return out


def make_gl_from_reads(
    reads: SampleReads,
    which_reads: np.ndarray,
    nSNPs: int,
    minGLValue: float = 1e-10,
) -> np.ndarray:
    """Haploid GLs [2, nSNPs] from the reads assigned to one latent hap.

    Per covered base multiply (pR, pA) into the site's column; then bound:
    each column is scaled so its max is 1 and the minor value floored at
    minGLValue (reference: Rcpp_make_gl_bound,
    QUILT/src/reference-single.cpp:68-98). Bases with bq == 0 are skipped.
    """
    gl = np.ones((2, nSNPs), dtype=np.float64)
    probs = bq_to_probs(reads.bq)
    for r in which_reads:
        s, t = reads.offsets[r], reads.offsets[r + 1]
        for j in range(s, t):
            if reads.bq[j] != 0:
                gl[:, reads.u[j]] *= probs[j]
    if minGLValue > 0:
        fix = (gl < minGLValue).any(axis=0)
        a, b = gl[0, fix], gl[1, fix]
        hi = np.maximum(a, b)
        a2 = np.where(a > b, 1.0, np.maximum(a / hi, minGLValue))
        b2 = np.where(a > b, np.maximum(b / hi, minGLValue), 1.0)
        gl[0, fix] = a2
        gl[1, fix] = b2
    return gl


def build_emat_dh(
    distinctHapsB: np.ndarray,
    gl: np.ndarray,
    nSNPs: int,
    ref_error: float,
) -> np.ndarray:
    """eMatDH [nMaxDH, nGrids]: emission of each distinct hap per grid.

    prob = prod over the grid's SNPs of (dR*(1-e) + dA*e) with e the
    inflated allele.
    """
    nMaxDH, nGrids = distinctHapsB.shape
    out = np.zeros((nMaxDH, nGrids), dtype=np.float64)
    for g in range(nGrids):
        s = 32 * g
        e_end = min(32 * (g + 1), nSNPs)
        n = e_end - s
        words = distinctHapsB[:, g]
        bits = ((words[:, None] >> np.arange(n, dtype=np.uint32)) & 1).astype(
            np.float64
        )
        eh = np.where(bits == 1, 1.0 - ref_error, ref_error)
        dR = gl[0, s:e_end]
        dA = gl[1, s:e_end]
        out[:, g] = np.prod(dR * (1.0 - eh) + dA * eh, axis=1)
    return out


def emission_for_word(
    word: int, gl: np.ndarray, s: int, n: int, ref_error: float
) -> float:
    """Emission of one packed 32-bit hap word vs GLs gl[:, s:s+n]."""
    bits = (np.uint32(word) >> np.arange(n, dtype=np.uint32)) & 1
    eh = np.where(bits == 1, 1.0 - ref_error, ref_error)
    return float(np.prod(gl[0, s:s + n] * (1 - eh) + gl[1, s:s + n] * eh))
