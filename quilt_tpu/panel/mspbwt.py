"""Multi-symbol PBWT over the distinct-haplotype symbol matrix.

Functional equivalent of the mspbwt package's index build + long-match query
used by QUILT2 (reference call sites: QUILT/R/mspbwt.R:29,106,159,284,297,323;
selection logic select_new_haps_mspbwt_v3, mspbwt.R:230-474).

The symbol sequence of haplotype k is hapMatcher[k, :] (per-grid distinct-hap
index, 0 = escape). `mspbwt_nindices` interleaved indices are built over grid
subsequences (index i covers grids i, i+n, i+2n, ...), mirroring
build_mspbwt_indices (mspbwt.R:22-55). Queries use the positional-prefix
insertion scan with up/down neighbor extension (the reference's "approach B",
Rcpp_ms_MatchZ_Algorithm5 scan; mspbwt.R:323-337).

NumPy implementation: index build is a one-time per-region host cost;
queries are O(nGrids x scan-width).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils import unpack_bits_32


@dataclass
class MsIndex:
    grids: np.ndarray        # int32 [T] grid indices covered by this index
    A: np.ndarray            # int32 [T+1, K] positional prefix arrays
    symbols: np.ndarray      # uint8 [K, T] symbol subsequence


def build_mspbwt_indices(
    hapMatcher: np.ndarray, n_indices: int = 4
) -> List[MsIndex]:
    K, nGrids = hapMatcher.shape
    n_indices = max(1, min(n_indices, nGrids))
    out = []
    for i in range(n_indices):
        grids = np.arange(i, nGrids, n_indices, dtype=np.int32)
        X = hapMatcher[:, grids]
        T = len(grids)
        A = np.zeros((T + 1, K), dtype=np.int32)
        A[0] = np.arange(K)
        for t in range(T):
            sym = X[A[t], t]
            order = np.argsort(sym, kind="stable")
            A[t + 1] = A[t][order]
        out.append(MsIndex(grids=grids, A=A, symbols=X))
    return out


def match_z(
    index: MsIndex,
    z: np.ndarray,
    min_length: int = 3,
    max_scan: int = 64,
) -> List[Tuple[int, int, int]]:
    """Find panel haplotypes with long matches to query symbols z [T].

    Returns (hap, end_t, length) tuples with length >= min_length (in index
    grids). At each position the query's insertion point is tracked through
    the prefix arrays; up to max_scan neighbors above/below the insertion
    point are extended backwards — the reference's "approach B" up/down
    scan (Rcpp_ms_MatchZ_Algorithm5), vectorized: per position the
    candidate block's backward match lengths come from one cumulative
    product instead of per-hap loops.
    """
    A, X = index.A, index.symbols
    T1, K = A.shape
    T = T1 - 1
    # insertion positions p[t] in A[t+1]
    p = np.zeros(T + 1, dtype=np.int64)
    p[0] = 0
    for t in range(T):
        sym_in_order = X[A[t], t]
        zt = z[t]
        below = int((sym_in_order < zt).sum())
        rank = int((sym_in_order[: p[t]] == zt).sum())
        p[t + 1] = below + rank
    matches: Dict[Tuple[int, int], int] = {}
    half = max_scan // 2
    for t in range(T - 1, -1, -1):
        a = A[t + 1]
        pos = int(p[t + 1])
        lo = max(pos - half, 0)
        hi = min(pos + half, K)
        cands = a[lo:hi]
        if len(cands) == 0:
            continue
        # backward match lengths ending at t, vectorized
        eq = X[cands, : t + 1] == z[: t + 1][None, :]       # [C, t+1]
        run = np.cumprod(eq[:, ::-1], axis=1)               # suffix runs
        lens = run.sum(axis=1)
        keep = lens >= min_length
        for k, L in zip(cands[keep].tolist(), lens[keep].tolist()):
            key = (k, t - L + 1)
            if key not in matches or matches[key] < L:
                matches[key] = L
    out = []
    for (k, start), L in matches.items():
        out.append((k, start + L - 1, L))
    return out


def symbols_from_hap_dosage(
    hap_dosage: np.ndarray,          # [nSNPs] imputed haploid dosage
    distinctHapsB: np.ndarray,       # uint32 [nMaxDH, nGrids]
    nSNPs: int,
) -> np.ndarray:
    """Round a haploid dosage vector to per-grid distinct-hap symbols.

    Equivalent of rcpp_int_contract + map_Z_to_all_symbols (mspbwt.R:284-297):
    pack rounded alleles to 32-bit words, then match each word to the grid's
    distinct-hap table. Words not in the table map to the Hamming-nearest
    distinct hap (the reference maps them to special symbols; nearest-match
    keeps the query dense and is at least as informative).
    """
    nMaxDH, nGrids = distinctHapsB.shape
    alleles = (np.asarray(hap_dosage) > 0.5).astype(np.uint8)
    S = nGrids * 32
    pad = np.zeros(S, dtype=np.uint8)
    pad[:nSNPs] = alleles[:nSNPs]
    bits = pad.reshape(nGrids, 4, 8)
    byte_vals = (bits << np.arange(8, dtype=np.uint8)).sum(axis=-1).astype(np.uint8)
    words = (
        byte_vals[:, 0].astype(np.uint32)
        | (byte_vals[:, 1].astype(np.uint32) << 8)
        | (byte_vals[:, 2].astype(np.uint32) << 16)
        | (byte_vals[:, 3].astype(np.uint32) << 24)
    )
    # vectorized over grids: exact word match, else Hamming-nearest
    ham = np.bitwise_count(distinctHapsB ^ words[None, :])   # [nMaxDH, G]
    z = (ham.argmin(axis=0) + 1).astype(np.uint8)
    return z


def select_new_haps_mspbwt(
    ms_indices: List[MsIndex],
    panel,                            # CompressedPanel
    hap_dosages: np.ndarray,          # [n_latent, nSNPs]
    Knew: int,
    K: int,
    previously_selected: np.ndarray,
    rng: np.random.Generator,
    mspbwtL: int = 3,
    mspbwtM: int = 1,
) -> np.ndarray:
    """Select Knew haplotypes by coverage-weighted ranking of long matches,
    interleaved across latent haplotypes (mspbwt.R:414-473)."""
    nSNPs = panel.nSNPs
    n_latent = hap_dosages.shape[0]
    per_hap_ranked: List[List[int]] = []
    coverage = np.zeros(K, dtype=np.float64)
    for h in range(n_latent):
        z_full = symbols_from_hap_dosage(
            hap_dosages[h], panel.distinctHapsB, nSNPs
        )
        scored: Dict[int, float] = {}
        for idx in ms_indices:
            z = z_full[idx.grids]
            for k, end_t, L in match_z(idx, z, min_length=mspbwtL):
                w = float(L)
                if k not in scored or scored[k] < w:
                    scored[k] = w
        ranked = sorted(scored, key=lambda k: -scored[k])
        per_hap_ranked.append(ranked)
    # interleave across latent haps, weight by 1/(1+coverage)
    chosen: List[int] = []
    prev = set(previously_selected.tolist())
    seen = set()
    ptrs = [0] * n_latent
    while len(chosen) < Knew:
        progressed = False
        for h in range(n_latent):
            while ptrs[h] < len(per_hap_ranked[h]):
                k = per_hap_ranked[h][ptrs[h]]
                ptrs[h] += 1
                if k in seen or k in prev:
                    continue
                chosen.append(k)
                seen.add(k)
                progressed = True
                break
            if len(chosen) >= Knew:
                break
        if not progressed:
            break
    if len(chosen) < Knew:
        pool = np.setdiff1d(np.arange(K), np.asarray(sorted(seen | prev)))
        fill = rng.choice(pool, size=Knew - len(chosen), replace=False)
        chosen.extend(fill.tolist())
    return np.asarray(chosen[:Knew], dtype=np.int64)


# ---------------------------------------------------------------------------
# (De)serialization into the PreparedReference npz
# ---------------------------------------------------------------------------

def save_ms_indices_into(d: dict, ms_indices: List[MsIndex]) -> None:
    d["msi_n"] = np.array(len(ms_indices))
    for i, idx in enumerate(ms_indices):
        d[f"msi_{i}_grids"] = idx.grids
        d[f"msi_{i}_A"] = idx.A
        d[f"msi_{i}_symbols"] = idx.symbols


def load_ms_indices_from(z) -> List[MsIndex]:
    n = int(z["msi_n"])
    return [
        MsIndex(
            grids=z[f"msi_{i}_grids"],
            A=z[f"msi_{i}_A"],
            symbols=z[f"msi_{i}_symbols"],
        )
        for i in range(n)
    ]
