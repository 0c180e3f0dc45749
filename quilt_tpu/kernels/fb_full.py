"""Batched full-panel haploid forward-backward (the QUILT1 hot kernel).

Functional equivalent of Rcpp_haploid_dosage_versus_refs (reference:
QUILT/src/reference-single.cpp:2189-2413, forward v3 at :878-1151, fused
backward + dosage + streaming top-K at :1152-2188), redesigned TPU-first:

- the grid axis is a lax.scan; the K (panel) axis is a dense vector lane
  axis, shardable over a mesh axis (see quilt_tpu/dist);
- per-grid emissions are a [B, nMaxDH+1] table lookup realized as a one-hot
  matmul on the MXU (gather-as-matmul), with the distinct-haplotype table
  built once per call from the sample's GLs;
- escape entries (haplotypes whose grid word is not among the top nMaxDH,
  hapMatcher == 0) are corrected exactly via a padded per-grid COO scatter —
  replacing the reference's per-element binary search
  (reference-single.cpp:2326-2331);
- the backward pass fuses per-SNP dosage accumulation (via the
  distinctHapsIE table, as in the reference) and top-K extraction at thinned
  grids (lax.top_k instead of the reference's streaming insertion sort,
  reference-single.cpp:129-266);
- numerics: float32 with per-grid renormalization (the reference's lazy fp64
  normalization, reference-single.cpp:521-537, does not survive fp32).

Batch axis B = {samples x chains x latent haps}.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..panel.prepare import CompressedPanel
from .common import pad_axis, pad_to_multiple
from .emissions import emat_dh_from_gl, emissions_for_words


@dataclass
class FBInputs:
    """Static (per-region) device inputs for fb_full, built once."""

    dh: np.ndarray            # int32 [nGrids, K] hapMatcher transposed (0=escape)
    dh_onehot_ready: bool
    ie: np.ndarray            # f32 [nMaxDH+1, S] inflated dosages (row 0 = 0)
    dh_bits: np.ndarray       # uint8 [nMaxDH, S] distinct hap alleles
    esc_k: np.ndarray         # int32 [nGrids, M] escape hap index (0 pad)
    esc_word: np.ndarray      # uint32 [nGrids, M]
    esc_mask: np.ndarray      # bool [nGrids, M]
    trans: np.ndarray         # f32 [nGrids, 2]; row g = (stay, jump) INTO grid g
    thin_flag: np.ndarray     # int32 [nGrids]; slot index at thinned grids else -1
    K: int
    K_pad: int
    nGrids: int
    S: int                    # padded SNP count = nGrids*32
    nSNPs: int
    nMaxDH: int
    M: int

    @classmethod
    def build(
        cls,
        panel: CompressedPanel,
        trans: np.ndarray,
        thinned_grids: Optional[np.ndarray] = None,
    ) -> "FBInputs":
        K, nGrids = panel.K, panel.nGrids
        K_pad = pad_to_multiple(K, 128)
        S = nGrids * 32
        dh = panel.hapMatcher.astype(np.int32).T          # [G, K]
        dh = pad_axis(dh, 1, K_pad, value=-1)             # pads get emission 0
        dh = np.where(dh < 0, 0, dh + 0)                  # pads -> slot 0 (0 emission)
        # mark pad rows: emission slot 0 yields 0; alpha stays 0 for pads
        ie = np.zeros((panel.nMaxDH + 1, S), dtype=np.float32)
        ie[1:, :panel.nSNPs] = panel.distinctHapsIE[:, :panel.nSNPs]
        from ..utils import unpack_bits_32
        dh_bits = np.zeros((panel.nMaxDH, S), dtype=np.uint8)
        dh_bits[:, :panel.nSNPs] = unpack_bits_32(panel.distinctHapsB, panel.nSNPs)
        esc_k, esc_word, esc_mask, M = panel.escape_padded()
        trans_full = np.zeros((nGrids, 2), dtype=np.float32)
        trans_full[0] = (1.0, 0.0)
        trans_full[1:] = np.asarray(trans, dtype=np.float32).T
        thin_flag = np.full(nGrids, -1, dtype=np.int32)
        if thinned_grids is not None:
            for i, g in enumerate(thinned_grids):
                thin_flag[int(g)] = i
        return cls(
            dh=dh, dh_onehot_ready=False, ie=ie, dh_bits=dh_bits,
            esc_k=esc_k.astype(np.int32), esc_word=esc_word.astype(np.uint32),
            esc_mask=esc_mask, trans=trans_full, thin_flag=thin_flag,
            K=K, K_pad=K_pad, nGrids=nGrids, S=S, nSNPs=panel.nSNPs,
            nMaxDH=panel.nMaxDH, M=M,
        )


@partial(
    jax.jit,
    static_argnames=("K", "K_pad", "nMaxDH", "M", "n_thin", "K_top", "ref_error"),
)
def _fb_core(
    gl: jnp.ndarray,          # [B, 2, S] f32 (pad SNPs = 1)
    dh: jnp.ndarray,          # [G, K_pad] int32
    ie: jnp.ndarray,          # [D+1, S]
    dh_bits: jnp.ndarray,     # [D, S] uint8
    esc_k: jnp.ndarray,       # [G, M]
    esc_word: jnp.ndarray,    # [G, M]
    esc_mask: jnp.ndarray,    # [G, M]
    trans: jnp.ndarray,       # [G, 2]
    thin_flag: jnp.ndarray,   # [G]
    K: int,
    K_pad: int,
    nMaxDH: int,
    M: int,
    n_thin: int,
    K_top: int,
    ref_error: float,
):
    B, _, S = gl.shape
    G = S // 32
    D1 = nMaxDH + 1
    eMatDH = emat_dh_from_gl(gl, dh_bits, ref_error)      # [B, G, D+1]
    gl_grids = gl.reshape(B, 2, G, 32)
    if M > 0:
        gl_per_grid = jnp.moveaxis(gl_grids, 2, 1)        # [B, G, 2, 32]
        esc_e = _esc_emissions(esc_word, gl_per_grid, ref_error)  # [B, G, M]
    else:
        esc_e = jnp.zeros((B, G, 1), dtype=jnp.float32)

    def emission_at(g):
        dh_g = dh[g]                                       # [K_pad]
        table = jax.lax.dynamic_index_in_dim(eMatDH, g, 1, keepdims=False)
        # gather-as-matmul: [B, D+1] x [D+1, K_pad] one-hot
        onehot = jax.nn.one_hot(dh_g, D1, dtype=table.dtype, axis=0)
        e = table @ onehot                                 # [B, K_pad]
        if M > 0:
            ek = esc_k[g]                                  # [M]
            ee = jax.lax.dynamic_index_in_dim(esc_e, g, 1, keepdims=False)
            em_mask = esc_mask[g]
            corr = jnp.where(em_mask[None, :], ee, 0.0)    # [B, M]
            e = e.at[:, ek].add(corr, mode="drop")
        return e

    def fwd_step(alpha, g):
        stay = trans[g, 0]
        jump = trans[g, 1]
        e = emission_at(g)
        a_raw = jnp.where(g == 0, e / K, (stay * alpha + jump / K) * e)
        s = a_raw.sum(axis=1, keepdims=True)
        a = a_raw / s
        return a, (a, jnp.log(s[:, 0]))

    alpha0 = jnp.zeros((B, K_pad), dtype=jnp.float32)
    _, (alphas, log_s) = jax.lax.scan(fwd_step, alpha0, jnp.arange(G))
    # log-likelihood: alpha normalized each grid => log P(O) = sum log s
    log_like = log_s.sum(axis=0)                           # [B]

    def bwd_step(carry, g):
        beta, _ = carry
        is_last = g == (G - 1)
        # transition INTO grid g+1 (trans row g+1 in the shifted layout)
        t_next = jax.lax.dynamic_index_in_dim(
            trans, jnp.minimum(g + 1, G - 1), 0, keepdims=False
        )
        e_next = emission_at(jnp.minimum(g + 1, G - 1))
        etb = e_next * beta
        beta_new = jnp.where(
            is_last,
            jnp.ones_like(beta),
            t_next[0] * etb + t_next[1] * etb.sum(axis=1, keepdims=True) / K,
        )
        # normalize beta for fp32 stability (gamma is renormalized anyway)
        beta_new = beta_new / jnp.maximum(
            beta_new.max(axis=1, keepdims=True), 1e-30
        )
        alpha_g = jax.lax.dynamic_index_in_dim(alphas, g, 0, keepdims=False)
        gamma = alpha_g * beta_new
        gamma = gamma / gamma.sum(axis=1, keepdims=True)
        # dosage for this grid via matched-gamma table (MXU):
        dh_g = dh[g]
        onehot = jax.nn.one_hot(dh_g, D1, dtype=gamma.dtype, axis=1)  # [K_pad, D+1]
        matched = gamma @ onehot                            # [B, D+1]
        ie_g = jax.lax.dynamic_slice(ie, (0, g * 32), (D1, 32))
        dos = matched @ ie_g                                # [B, 32]
        if M > 0:
            ek = esc_k[g]
            ew = esc_word[g]
            em_mask = esc_mask[g]
            g_esc = jnp.where(em_mask[None, :], gamma[:, ek], 0.0)  # [B, M]
            shifts = jnp.arange(32, dtype=jnp.uint32)
            bits = ((ew[:, None] >> shifts) & jnp.uint32(1)).astype(jnp.float32)
            e_inf = bits * (1.0 - 2.0 * ref_error) + ref_error      # [M, 32]
            dos = dos + g_esc @ e_inf
        # top-K at thinned grids
        tf = thin_flag[g]
        def do_topk(_):
            v, i = jax.lax.top_k(gamma[:, :K], K_top)
            return v, i.astype(jnp.int32)
        def no_topk(_):
            return (
                jnp.zeros((B, K_top), dtype=gamma.dtype),
                jnp.zeros((B, K_top), dtype=jnp.int32),
            )
        tv, ti = jax.lax.cond(tf >= 0, do_topk, no_topk, None)
        return (beta_new, None), (dos, tv, ti)

    _, (dosage_grids, top_vals, top_idx) = jax.lax.scan(
        bwd_step,
        (jnp.ones((B, K_pad), dtype=jnp.float32), None),
        jnp.arange(G - 1, -1, -1),
    )
    # dosage_grids come out in reversed grid order
    dosage = dosage_grids[::-1].transpose(1, 0, 2).reshape(B, S)
    return dosage, log_like, top_vals[::-1], top_idx[::-1]


def _esc_emissions(esc_word, gl_per_grid, ref_error):
    """Escape emissions [B, G, M] from words [G, M] and gl [B, G, 2, 32]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((esc_word[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.float32)
    e = bits * (1.0 - 2.0 * ref_error) + ref_error          # [G, M, 32]
    dR = gl_per_grid[:, :, 0, :][:, :, None, :]             # [B, G, 1, 32]
    dA = gl_per_grid[:, :, 1, :][:, :, None, :]
    term = dR * (1.0 - e[None]) + dA * e[None]              # [B, G, M, 32]
    return jnp.exp(jnp.log(jnp.maximum(term, 1e-30)).sum(axis=-1))


def fb_full_batched(
    gl: np.ndarray,                  # [B, 2, nSNPs] float
    inputs: FBInputs,
    K_top: int = 16,
    ref_error: float = 0.001,
    return_arrays: bool = True,
):
    """Run the batched FB; returns (dosage [B, nSNPs], log_like [B],
    top_vals [nGrids, B, K_top], top_idx [nGrids, B, K_top]).

    top_* rows are only meaningful at grids with thin_flag >= 0.
    """
    B = gl.shape[0]
    S = inputs.S
    gl_pad = np.ones((B, 2, S), dtype=np.float32)
    gl_pad[:, :, : gl.shape[2]] = gl
    n_thin = int((inputs.thin_flag >= 0).sum())
    dosage, log_like, tv, ti = _fb_core(
        jnp.asarray(gl_pad),
        jnp.asarray(inputs.dh),
        jnp.asarray(inputs.ie),
        jnp.asarray(inputs.dh_bits),
        jnp.asarray(inputs.esc_k),
        jnp.asarray(inputs.esc_word),
        jnp.asarray(inputs.esc_mask),
        jnp.asarray(inputs.trans),
        jnp.asarray(inputs.thin_flag),
        K=inputs.K,
        K_pad=inputs.K_pad,
        nMaxDH=inputs.nMaxDH,
        M=inputs.M,
        n_thin=n_thin,
        K_top=K_top,
        ref_error=ref_error,
    )
    if return_arrays:
        return (
            np.asarray(dosage)[:, : inputs.nSNPs],
            np.asarray(log_like),
            np.asarray(tv),
            np.asarray(ti),
        )
    return dosage, log_like, tv, ti
