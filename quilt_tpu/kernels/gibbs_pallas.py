"""Fused Pallas TPU kernels for the per-read Gibbs sweep.

Same math as kernels/gibbs.py:_gibbs_core (the functional equivalent of
rcpp_forwardBackwardGibbsNIPT, reference QUILT/src/gibbs-nipt.cpp:2395-3318),
but the whole forward grid-sweep — alpha advance + sequential in-grid read
resampling — runs as ONE Pallas kernel per Gibbs iteration, with:

- alpha / pC / logc carried in VMEM scratch across the pipelined per-grid
  blocks (the XLA scan version pays a fixed per-fused-op dispatch latency at
  every one of G x reads sequential micro-steps; here a grid step is a single
  kernel step whose HBM traffic is double-buffered by the Pallas pipeline);
- a GRID-PADDED read layout [G, W, B(, K)]: slot (g, i, b) holds batch row
  b's i-th read in grid g (W = max reads per grid over rows). This replaces
  the per-row dynamic gathers of the XLA path with contiguous block DMA —
  every per-read tensor the kernel touches is a plain VMEM row;
- per-read log emissions streamed as float16 [G, W, B, K] (values are
  rescaled per read to [log(1/maxDifferenceBetweenReads), 0], well inside
  fp16 range); all arithmetic is float32;
- the backward (beta) recursion as a second, read-free Pallas kernel scanned
  in reverse grid order.

Block-Gibbs escape moves, per-iteration likelihoods and the final dosage
pass stay in XLA (they are infrequent / bandwidth-trivial); see
run_gibbs_chains_pallas. Layouts here are nl-major: state rows h*B+b.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_W = 64                      # VMEM budget cap for the read-slot axis
_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_within_default_pallas(flag):
    from .gibbs import _block_within_default

    return _block_within_default(flag)


# ---------------------------------------------------------------------------
# forward sweep kernel
# ---------------------------------------------------------------------------


def _make_fwd_kernel(nl, B, W, K, K_real, it_mode, prior):
    """it_mode: 0 = first iterative-init iteration (pass reads < first_read,
    init reads >= first_read), 1 = second (init reads < first_read),
    2 = normal sweep. prior: tuple of nl floats. W here is the per-chunk
    slot width: grid dim 1 tiles the read-slot axis in W-wide chunks so
    dense-coverage grids (reads/grid > 64) no longer fall back to XLA —
    alpha advance runs at chunk 0, reads continue sequentially across
    chunks through the VMEM scratch state.

    The four per-slot planes (uniform bits / labels / skip / read id) ride
    ONE packed [4, W, B] int32 input: each extra streamed operand costs a
    fixed per-step DMA overhead comparable to its transfer time at these
    block sizes, and in-place aliasing serialises the pipeline on the
    write-after-read hazard (measured: ~1.7 us/step), so lemg/H are
    ping-ponged by XLA between sweeps instead of aliased."""
    log_prior = tuple(float(np.log(p)) for p in prior)

    def kernel(
        lemg_in, beta_in, lem_blk, slots_blk, first_rd, lab_init,
        trans_s, cnt_s,
        lemg_out, alpha_out, h_out, logc_out, uf_out, lab_out,
        alpha_s, pc_s, logc_s, uf_s, lab_s,
    ):
        g = pl.program_id(0)
        wc = pl.program_id(1)
        f32 = jnp.float32
        km = (
            jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < K_real
        ).astype(f32)
        h_out[0] = slots_blk[0, 1]
        col = lambda x: jnp.transpose(x, (1, 0))           # (1,B) -> (B,1)

        @pl.when((g == 0) & (wc == 0))
        def _():
            alpha_s[...] = jnp.zeros_like(alpha_s)
            logc_s[...] = jnp.zeros_like(logc_s)
            uf_s[...] = jnp.zeros_like(uf_s)
            lab_s[...] = lab_init[...]

        # ---- alpha advance into grid g (first chunk only) ----
        @pl.when(wc == 0)
        def _():
            lemg = lemg_in[0]                              # (BN, K) f32
            lemg_out[0] = lemg
            lm = jnp.where(km > 0, lemg, _NEG)
            mx = jnp.max(lm, axis=1, keepdims=True)        # (BN, 1)
            e_g = jnp.exp(lemg - mx) * km
            t0 = trans_s[0, g]
            t1 = trans_s[1, g]
            is_first = (g == 0).astype(f32)
            a_raw = e_g * (
                t0 * alpha_s[...] + (t1 + is_first) * (1.0 / K_real)
            )
            s = jnp.sum(a_raw, axis=1, keepdims=True)      # (BN, 1)
            ufv = uf_s[...]
            for h in range(nl):
                sh = s[h * B:(h + 1) * B]
                ufv = jnp.maximum(
                    ufv, ((~jnp.isfinite(sh)) | (sh <= 0)).astype(f32)
                )
            uf_s[...] = ufv
            s_safe = jnp.where(s > 0, s, 1.0)
            alpha_s[...] = a_raw * (1.0 / s_safe)
            logc_s[...] = logc_s[...] + jnp.log(s_safe) + mx
            pc_s[...] = jnp.sum(
                alpha_s[...] * beta_in[0], axis=1, keepdims=True
            )

        beta_g = beta_in[0]
        first_col = first_rd[...]                          # (B, 1) int32

        def read_body(i, _):
            lem_i = lem_blk[0, i].astype(f32)              # (B, K)
            emk = jnp.exp(lem_i)
            inv = jnp.exp(-lem_i)
            u = col(jax.lax.bitcast_convert_type(
                slots_blk[0, 0, pl.ds(i, 1), :], jnp.float32
            ))                                             # (B, 1)
            h_rC = col(h_out[0, pl.ds(i, 1), :])           # (B, 1) int32
            skip = col(slots_blk[0, 2, pl.ds(i, 1), :]) > 0
            rg = col(slots_blk[0, 3, pl.ds(i, 1), :])
            alpha = alpha_s[...]
            pc = pc_s[...]
            gain = []
            lose = []
            pcs = []
            for h in range(nl):
                ab = alpha[h * B:(h + 1) * B] * beta_g[h * B:(h + 1) * B]
                gain.append(jnp.sum(ab * emk, axis=1, keepdims=True))
                lose.append(jnp.sum(ab * inv, axis=1, keepdims=True))
                pcs.append(pc[h * B:(h + 1) * B])
            if it_mode == 0:
                doing_pass = rg < first_col
                doing_init = rg >= first_col
            elif it_mode == 1:
                doing_pass = jnp.zeros_like(skip)
                doing_init = rg < first_col
            else:
                doing_pass = jnp.zeros_like(skip)
                doing_init = jnp.zeros_like(skip)
            normal = ~doing_init

            oh_C = [h_rC == h for h in range(nl)]
            lose_C = lose[0]
            for h in range(1, nl):
                lose_C = jnp.where(oh_C[h], lose[h], lose_C)

            # candidate weights: w[n] = prior[n] * prod_m term(n, m)
            # term(n,m): doing_init -> gain[n] if m==n else pc[m]
            #            normal    -> pc[m] everywhere if n==h_rC;
            #                         else gain[n] at m==n, lose_C at m==h_rC,
            #                         pc[m] otherwise
            # (reference: sample_reads_in_grid, gibbs-nipt.cpp:733-1341)
            w = []
            for n in range(nl):
                prod = None
                for m in range(nl):
                    if m == n:
                        t_norm = jnp.where(oh_C[n], pcs[m], gain[n])
                        t_init = gain[n]
                    else:
                        t_norm = jnp.where(
                            oh_C[n], pcs[m],
                            jnp.where(oh_C[m], lose_C, pcs[m]),
                        )
                        t_init = pcs[m]
                    term = jnp.where(doing_init, t_init, t_norm)
                    prod = term if prod is None else prod * term
                w.append(prod * float(prior[n]))
            wsum = w[0]
            for n in range(1, nl):
                wsum = wsum + w[n]
            badv = (~jnp.isfinite(wsum)) | (wsum <= 0)
            uf_s[...] = jnp.maximum(
                uf_s[...], (badv & ~skip).astype(f32)
            )
            wsum_safe = jnp.where(wsum > 0, wsum, 1.0)
            # h_new = number of candidates whose cumulative prob <= u
            cum = jnp.zeros_like(wsum)
            h_new = jnp.zeros_like(h_rC)
            for n in range(nl - 1):
                cum = cum + jnp.where(badv, 1.0 / nl, w[n] / wsum_safe)
                h_new = h_new + (cum <= u).astype(jnp.int32)
            active = (~skip) & (~doing_pass) & (~badv)
            oh_N = [h_new == h for h in range(nl)]
            flip = active & ((h_new != h_rC) | doing_init)

            new_alpha = []
            s_new = []
            for h in range(nl):
                fac = jnp.where(oh_N[h], emk, 1.0) * jnp.where(
                    oh_C[h] & normal, inv, 1.0
                )
                a_h = alpha[h * B:(h + 1) * B] * jnp.where(flip, fac, 1.0)
                new_alpha.append(a_h)
                s_new.append(
                    jnp.sum(a_h * km, axis=1, keepdims=True)
                )
            flip_f = flip.astype(f32)
            for h in range(nl):
                d_h = (
                    oh_N[h].astype(f32)
                    - oh_C[h].astype(f32) * normal.astype(f32)
                ) * flip_f
                lemg_out[0, h * B:(h + 1) * B] = (
                    lemg_out[0, h * B:(h + 1) * B] + d_h * lem_i
                )
                # running per-row label counts (feeds the per-iteration
                # likelihood row without an XLA [G, W, B] pass); unlike
                # the lemg delta, an init-pass assignment also vacates the
                # read's previous (randomly initialised) label
                lab_s[:, h:h + 1] = lab_s[:, h:h + 1] + (
                    oh_N[h].astype(f32) - oh_C[h].astype(f32)
                ) * flip_f
            h_out[0, pl.ds(i, 1), :] = jnp.transpose(
                jnp.where(flip, h_new, h_rC), (1, 0)
            )
            # pC after the move: the winning hap gets gain; (normal) the
            # previous hap gets lose_C; others keep their value
            for h in range(nl):
                pc_h = pcs[h]
                pc_new = jnp.where(
                    oh_N[h], gain[h],
                    jnp.where(oh_C[h] & normal, lose_C, pc_h),
                )
                pc_h = jnp.where(flip, pc_new, pc_h)
                sh = s_new[h]
                sh_safe = jnp.where(sh > 0, sh, 1.0)
                rs = 1.0 / sh_safe                         # (B, 1): one divide
                alpha_s[h * B:(h + 1) * B] = new_alpha[h] * rs
                logc_s[h * B:(h + 1) * B] = (
                    logc_s[h * B:(h + 1) * B] + jnp.log(sh_safe)
                )
                pc_s[h * B:(h + 1) * B] = pc_h * rs
            return 0

        n_loc = jnp.clip(cnt_s[0, g] - wc * W, 0, W)
        jax.lax.fori_loop(0, n_loc, read_body, 0)
        alpha_out[0] = alpha_s[...]
        logc_out[...] = logc_s[...]
        uf_out[...] = uf_s[...]
        lab_out[...] = lab_s[...]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nl", "K_real", "it_mode", "prior", "want_alpha"),
)
def _fwd_sweep(
    lemg, beta, lem_pad, slots, first_read, lab_init, trans,
    cnt_max, nl, K_real, it_mode, prior, want_alpha=True,
):
    """One forward Gibbs sweep. Shapes:
    lemg/beta [G, BN, K] f32; lem_pad [G, W, B, K] f16/f32;
    slots [G, 4, W, B] i32 (packed planes: uniform bits / H / skip / read
    id); first_read [B, 1] i32; trans [2, G] f32 (SMEM); cnt_max [1, G]
    i32; lab_init [B, nl] f32 label counts entering the sweep. Returns
    (lemg', alphas, H_pad', logc [BN,1], uf [B,1], lab [B, nl]).

    want_alpha=False skips streaming the [G, BN, K] alpha planes back to
    HBM (the alphas are only consumed on block-move and final iterations);
    the output is a dummy [1, BN, K] the caller must ignore."""
    G, BN, K = lemg.shape
    W = lem_pad.shape[1]
    B = BN // nl
    # tile the slot axis: VMEM sees W-chunked blocks; chunks run
    # sequentially within a grid (TPU grid order: last dim innermost)
    Wc = min(W, _MAX_W)
    n_wc = (W + Wc - 1) // Wc
    assert W == n_wc * Wc, "slot axis must be padded to the chunk size"
    kernel = _make_fwd_kernel(nl, B, Wc, K, K_real, it_mode, prior)
    big = lambda: pl.BlockSpec((1, BN, K), lambda g, wc: (g, 0, 0),
                               memory_space=pltpu.VMEM)
    slot = lambda: pl.BlockSpec((1, Wc, B), lambda g, wc: (g, wc, 0),
                                memory_space=pltpu.VMEM)
    const2 = lambda a, b: pl.BlockSpec((a, b), lambda g, wc: (0, 0),
                                       memory_space=pltpu.VMEM)
    if want_alpha:
        alpha_spec = big()
        alpha_shape = jax.ShapeDtypeStruct((G, BN, K), jnp.float32)
    else:
        # constant-index dummy block: written back once, not per step
        alpha_spec = pl.BlockSpec((1, BN, K), lambda g, wc: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        alpha_shape = jax.ShapeDtypeStruct((1, BN, K), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(G, n_wc),
        in_specs=[
            big(),                                         # lemg_in
            big(),                                         # beta_in
            pl.BlockSpec((1, Wc, B, K), lambda g, wc: (g, wc, 0, 0),
                         memory_space=pltpu.VMEM),         # lem_blk
            pl.BlockSpec((1, 4, Wc, B), lambda g, wc: (g, 0, wc, 0),
                         memory_space=pltpu.VMEM),         # slots (packed)
            const2(B, 1),                                  # first_read
            const2(B, nl),                                 # lab_init
            pl.BlockSpec(memory_space=pltpu.SMEM),         # trans (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),         # cnt_max (whole)
        ],
        out_specs=[
            big(),                                         # lemg_out
            alpha_spec,                                    # alpha_out
            slot(),                                        # h_out
            const2(BN, 1),                                 # logc_out
            const2(B, 1),                                  # uf_out
            const2(B, nl),                                 # lab_out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, BN, K), jnp.float32),
            alpha_shape,
            jax.ShapeDtypeStruct((G, W, B), jnp.int32),
            jax.ShapeDtypeStruct((BN, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, nl), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BN, K), jnp.float32),              # alpha_s
            pltpu.VMEM((BN, 1), jnp.float32),              # pc_s
            pltpu.VMEM((BN, 1), jnp.float32),              # logc_s
            pltpu.VMEM((B, 1), jnp.float32),               # uf_s
            pltpu.VMEM((B, nl), jnp.float32),              # lab_s
        ],
        interpret=_interpret(),
    )(lemg, beta, lem_pad, slots, first_read, lab_init, trans, cnt_max)
    return out


# ---------------------------------------------------------------------------
# backward sweep kernel
# ---------------------------------------------------------------------------


def _make_bwd_kernel(nl, B, K, K_real, G):
    def kernel(lemg_n, trans_n, beta_out, beta_s):
        st = pl.program_id(0)
        f32 = jnp.float32
        km = (
            jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < K_real
        ).astype(f32)

        @pl.when(st == 0)
        def _():
            beta_s[...] = jnp.ones_like(beta_s)
            beta_out[0] = beta_s[...]

        @pl.when(st > 0)
        def _():
            lemg = lemg_n[0]                               # lemg at g+1
            lm = jnp.where(km > 0, lemg, _NEG)
            mx = jnp.max(lm, axis=1, keepdims=True)
            e = jnp.exp(lemg - mx) * km
            etb = e * beta_s[...]
            gn = G - st                                    # = g + 1
            t0 = trans_n[0, gn]
            t1 = trans_n[1, gn]
            parts = []
            for h in range(nl):
                etb_h = etb[h * B:(h + 1) * B]
                sm = jnp.sum(etb_h, axis=1, keepdims=True)
                parts.append(t0 * etb_h + t1 * sm * (1.0 / K_real))
            bn = jnp.concatenate(parts, axis=0)
            mxb = jnp.max(bn, axis=1, keepdims=True)
            bn = bn / jnp.where(mxb > 0, mxb, 1.0)
            beta_s[...] = bn
            beta_out[0] = bn

    return kernel


@functools.partial(jax.jit, static_argnames=("nl", "K_real"))
def _bwd_sweep(lemg, trans, nl, K_real):
    G, BN, K = lemg.shape
    B = BN // nl
    kernel = _make_bwd_kernel(nl, B, K, K_real, G)
    beta = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, BN, K),
                lambda s: (jnp.minimum(G - s, G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),         # trans (whole)
        ],
        out_specs=pl.BlockSpec(
            (1, BN, K), lambda s: (G - 1 - s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((G, BN, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BN, K), jnp.float32)],
        interpret=_interpret(),
    )(lemg, trans)
    return beta


# ---------------------------------------------------------------------------
# dosage kernel
# ---------------------------------------------------------------------------


def _make_dos_kernel(nl, B, K, K_real, ref_error):
    def kernel(alpha_in, beta_in, words_in, hd_out):
        f32 = jnp.float32
        km = (
            jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) < K_real
        ).astype(f32)
        gam = alpha_in[0] * beta_in[0] * km                 # (BN, K)
        s = jnp.sum(gam, axis=1, keepdims=True)
        gam = gam * (1.0 / jnp.maximum(s, 1e-30))
        w = words_in[0]                                     # (B, K) i32
        for t in range(32):
            bit = ((w >> t) & 1).astype(f32)
            e_t = bit * (1.0 - 2.0 * ref_error) + ref_error
            for h in range(nl):
                hd_out[0, h * B:(h + 1) * B, t] = jnp.sum(
                    gam[h * B:(h + 1) * B] * e_t, axis=1
                )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nl", "K_real", "ref_error")
)
def _dosage_sweep(alphas, beta, words_T, nl, K_real, ref_error):
    """Per-grid haplotype dosages from the final FB state: gamma
    normalisation + packed-word unpack + per-bit contraction fused in one
    Pallas pass (the XLA scan paid a per-grid dispatch and a slow
    variable-shift expansion). alphas/beta [G, BN, K]; words_T [G, B, K]
    packed. Returns hd [G, BN, 32] f32."""
    G, BN, K = alphas.shape
    B = words_T.shape[1]
    kernel = _make_dos_kernel(BN // B, B, K, K_real, float(ref_error))
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, BN, K), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN, K), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BN, 32), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, BN, 32), jnp.float32),
        interpret=_interpret(),
    )(alphas, beta, words_T)


# ---------------------------------------------------------------------------
# XLA-side pieces (block moves, likelihoods, dosage, layout builders)
# ---------------------------------------------------------------------------


def _block_moves_padded(
    lemg, beta, alphas, H_pad, valid, boundaries, block_u_it, nl, B, K_real,
    log_prior,
):
    """Diploid suffix-swap escape moves on the nl-major [G, BN, K] layout.

    Same proposals/acceptance as kernels/gibbs.py:block_moves_pair
    (functional equivalent of Rcpp_shard_block_gibbs_resampler,
    QUILT/src/gibbs-nipt-block.cpp:1975-2355)."""
    G, BN, K = lemg.shape
    km = (jnp.arange(K) < K_real).astype(jnp.float32)
    NB = boundaries.shape[0]
    grid_ids = jnp.arange(G)

    def bound_body(j, st):
        lemg, beta, alphas, H_pad = st
        b = boundaries[j]
        isvalid = b > 0
        bb = jnp.maximum(b, 1)
        sfx_g = grid_ids >= bb                             # [G]
        i, j2 = 0, 1
        alpha_b = jax.lax.dynamic_index_in_dim(alphas, bb - 1, 0, False)
        beta_b = jax.lax.dynamic_index_in_dim(beta, bb - 1, 0, False)
        ai, aj = alpha_b[i * B:(i + 1) * B], alpha_b[j2 * B:(j2 + 1) * B]
        bi, bj = beta_b[i * B:(i + 1) * B], beta_b[j2 * B:(j2 + 1) * B]
        cii = (ai * bi * km).sum(axis=1)
        cjj = (aj * bj * km).sum(axis=1)
        cij = (ai * bj * km).sum(axis=1)
        cji = (aj * bi * km).sum(axis=1)
        w_keep = cii * cjj
        w_swap = cij * cji
        tot = w_keep + w_swap
        ok = jnp.isfinite(tot) & (tot > 0)
        p_swap = jnp.where(ok, w_swap / jnp.where(tot > 0, tot, 1.0), 0.0)
        u = block_u_it[j, 0]                               # [B]
        do_swap = isvalid & ok & (u < p_swap)              # [B]
        cg = (sfx_g[:, None] & do_swap[None, :])[:, :, None]  # [G,B,1]
        for idx in range(3):
            arr = (lemg, beta, alphas)[idx]
            xi = arr[:, i * B:(i + 1) * B]
            xj = arr[:, j2 * B:(j2 + 1) * B]
            new_i = jnp.where(cg, xj, xi)
            new_j = jnp.where(cg, xi, xj)
            arr = arr.at[:, i * B:(i + 1) * B].set(new_i)
            arr = arr.at[:, j2 * B:(j2 + 1) * B].set(new_j)
            if idx == 0:
                lemg = arr
            elif idx == 1:
                beta = arr
            else:
                alphas = arr
        cr = sfx_g[:, None, None] & do_swap[None, None, :]
        H_pad = jnp.where(cr & (H_pad == i), nl + 7,
                          jnp.where(cr & (H_pad == j2), i, H_pad))
        H_pad = jnp.where(H_pad == nl + 7, j2, H_pad)
        return (lemg, beta, alphas, H_pad)

    return jax.lax.fori_loop(
        0, NB, bound_body, (lemg, beta, alphas, H_pad)
    )


def _compute_Hclass_padded(alphas, beta, lem_pad, H_pad, live, prior, rlc):
    """Batched NIPT read classification on the grid-padded layout (see
    kernels/nipt.py for the semantics and the mid-sweep-vs-end-of-iteration
    deviation note). alphas/beta [G, 3B, K]; lem_pad [G, W, B, K];
    H_pad/live [G, W, B]. Returns H_class_pad [G, W, B] int32."""
    from .gibbs import _classify3

    G, BN, K = alphas.shape
    W, B = lem_pad.shape[1], lem_pad.shape[2]

    def body(_, xs):
        a_g, b_g, lem_g, h_g, live_g = xs
        ab = (a_g * b_g).reshape(3, B, K)
        em = jnp.exp(lem_g.astype(jnp.float32))            # [W, B, K]
        gain = jnp.einsum("wbk,hbk->wbh", em, ab)
        lose = jnp.einsum("wbk,hbk->wbh", 1.0 / em, ab)
        h_cur = jnp.clip(h_g, 0, 2)
        lose_C = jnp.take_along_axis(lose, h_cur[:, :, None], axis=2)[..., 0]
        pC = jnp.transpose(ab.sum(axis=2))[None, :, :]     # [1, B, 3]
        cls = _classify3(gain, lose_C, pC, h_cur, prior, rlc)
        return None, jnp.where(live_g, cls, 0)

    _, hc = jax.lax.scan(body, None, (alphas, beta, lem_pad, H_pad, live))
    return hc


def _apply_perm3_padded(chosen, cond_g, cond_rw, lemg, beta, alphas,
                        H_pad, Hc_pad):
    """Apply per-row relabelling `chosen` [B] in 0..5 (see kernels/nipt.py
    tables) to the nl-major planes, padded read labels and classes, where
    cond_g [G, B] / cond_rw [G, W, B] hold."""
    from . import nipt as nipt_tables

    G, BN, K = lemg.shape
    B = chosen.shape[0]
    arr4 = lambda a: a.reshape(G, 3, B, K)
    invs_t = jnp.asarray(nipt_tables.INVS)
    perms_t = jnp.asarray(nipt_tables.PERMS)
    clsperm_t = jnp.asarray(nipt_tables.CLASS_PERM)
    idx = jnp.transpose(invs_t[chosen])                    # [3, B]
    cg = cond_g[:, None, :, None]                          # [G, 1, B, 1]
    out = []
    for a in (lemg, beta, alphas):
        a4 = arr4(a)
        permuted = jnp.take_along_axis(a4, idx[None, :, :, None], axis=1)
        out.append(jnp.where(cg, permuted, a4).reshape(G, BN, K))
    lemg, beta, alphas = out
    rows = jnp.arange(B)
    perm_rows = perms_t[chosen]                            # [B, 3]
    H_new = perm_rows[rows[None, None, :], jnp.clip(H_pad, 0, 2)]
    H_pad = jnp.where(cond_rw, H_new, H_pad)
    cp_rows = clsperm_t[chosen]                            # [B, 8]
    Hc_new = cp_rows[rows[None, None, :], Hc_pad]
    Hc_pad = jnp.where(cond_rw, Hc_new, Hc_pad)
    return lemg, beta, alphas, H_pad, Hc_pad


def _block_moves_nipt_padded(
    lemg, beta, alphas, H_pad, Hc_pad, valid, boundaries, block_u_it,
    B, K_real, clp, perm_mask,
):
    """NIPT 6-permutation suffix relabelling on the nl-major layout; same
    proposals/acceptance as kernels/gibbs.py:block_moves_nipt (functional
    equivalent of Rcpp_block_gibbs_resampler with block_approach=6,
    QUILT/src/gibbs-nipt-block.cpp:590-954,1636-1974)."""
    from .gibbs import _perm_block_probs, _sample_idx

    G, BN, K = lemg.shape
    km = (jnp.arange(K) < K_real).astype(jnp.float32)
    NB = boundaries.shape[0]
    grid_ids = jnp.arange(G)

    def bound_body(j, st):
        lemg, beta, alphas, H_pad, Hc_pad = st
        b = boundaries[j]
        isvalid = b > 0
        bb = jnp.maximum(b, 1)
        sfx_g = (grid_ids >= bb) & isvalid                 # [G]
        alpha_b = jax.lax.dynamic_index_in_dim(
            alphas, bb - 1, 0, False
        ).reshape(3, B, K)
        beta_b = jax.lax.dynamic_index_in_dim(
            beta, bb - 1, 0, False
        ).reshape(3, B, K)
        cmat = jnp.einsum(
            "ibk,jbk->bij", alpha_b, beta_b * km[None, None, :]
        )
        mr = sfx_g[:, None, None] & valid                  # [G, W, B]
        ns = jnp.stack(
            [((Hc_pad == c) & mr).sum(axis=(0, 1)).astype(jnp.float32)
             for c in range(8)],
            axis=-1,
        )                                                  # [B, 8]
        probs = _perm_block_probs(cmat, ns, clp, perm_mask)
        chosen = _sample_idx(probs, block_u_it[j, 0])      # [B]
        cond_g = jnp.broadcast_to(sfx_g[:, None], (G, B))
        cond_rw = mr
        return _apply_perm3_padded(
            chosen, cond_g, cond_rw, lemg, beta, alphas, H_pad, Hc_pad
        )

    return jax.lax.fori_loop(
        0, NB, bound_body, (lemg, beta, alphas, H_pad, Hc_pad)
    )


def _live_jump_rate_padded(alphas, beta, lemg, trans_t, nl, B, K_real,
                           include3):
    """[G-1, B] per-gap posterior jump rate summed over latent haps from
    the live FB state, nl-major layout (see gibbs._gibbs_core's
    _live_jump_rate; reference: QUILT/src/gibbs-nipt-block.cpp:348-365)."""
    G, BN, K = lemg.shape
    km_row = jnp.arange(K) < K_real
    kmf = km_row.astype(jnp.float32)
    lm = jnp.where(km_row[None, None, :], lemg, -jnp.inf)
    mx = lm.max(axis=2, keepdims=True)
    e = jnp.exp(lemg - mx) * kmf
    eb = e * beta
    n1 = (alphas[:-1] * eb[1:]).sum(axis=2)            # [G-1, BN]
    n2 = alphas[:-1].sum(axis=2) * eb[1:].sum(axis=2) / K_real
    t0 = trans_t[0, 1:][:, None]
    t1 = trans_t[1, 1:][:, None]
    denom = t0 * n1 + t1 * n2
    njf = jnp.where(denom > 0, t0 * n1 / jnp.maximum(denom, 1e-300), 1.0)
    r = (1.0 - njf).reshape(G - 1, nl, B)
    if nl == 3 and not include3:
        rate2 = r[:, 0] + r[:, 1]
    else:
        rate2 = r.sum(axis=1)
    return rate2.at[-1].set(0.0)


def _suffix_pair_composed_padded(
    lemg, beta, alphas, H_pad, bnd_rb, block_u_j0, nl, B, K_real
):
    """Composed diploid suffix swaps on the nl-major padded layout at
    per-row boundaries (see gibbs._pair_swap_parity)."""
    from .gibbs import _pair_swap_parity

    G, BN, K = lemg.shape
    km = (jnp.arange(K) < K_real).astype(jnp.float32)
    idxg = jnp.clip(bnd_rb - 1, 0, G - 1)              # [NBu, B]
    idx_bn = jnp.concatenate([idxg] * nl, axis=1)      # [NBu, BN]
    NBu = bnd_rb.shape[0]
    a4 = jnp.take_along_axis(
        alphas, idx_bn[:, :, None], axis=0
    ).reshape(NBu, nl, B, K)
    b4 = jnp.take_along_axis(
        beta, idx_bn[:, :, None], axis=0
    ).reshape(NBu, nl, B, K)
    C = jnp.einsum("jibk,jlbk->jbil", a4, b4 * km)
    parity_g = _pair_swap_parity(C[..., :2, :2], block_u_j0, bnd_rb, G)
    p_i = parity_g.astype(jnp.int32)                   # [G, B]
    idx2 = jnp.stack([p_i, 1 - p_i], axis=1)           # [G, 2, B]
    if nl == 3:
        idx2 = jnp.concatenate(
            [idx2, jnp.full_like(p_i, 2)[:, None, :]], axis=1
        )
    out = []
    for arr in (lemg, beta, alphas):
        a = arr.reshape(G, nl, B, K)
        out.append(
            jnp.take_along_axis(a, idx2[:, :, :, None], axis=1)
            .reshape(G, BN, K)
        )
    lemg, beta, alphas = out
    par_w = parity_g[:, None, :]                       # [G, 1, B]
    H_pad = jnp.where(par_w & (H_pad == 0), nl + 7,
                      jnp.where(par_w & (H_pad == 1), 0, H_pad))
    H_pad = jnp.where(H_pad == nl + 7, 1, H_pad)
    return lemg, beta, alphas, H_pad


def _suffix_nipt_composed_padded(
    lemg, beta, alphas, H_pad, Hc_pad, valid, bnd_rb, block_u_j0, clp,
    perm_mask, B, K_real,
):
    """Composed NIPT 6-permutation suffix relabelling on the nl-major
    padded layout at per-row boundaries (see gibbs._compose_suffix_perms)."""
    from . import nipt as nipt_tables
    from .gibbs import _compose_suffix_perms, _perm_of_grid

    G, BN, K = lemg.shape
    km = (jnp.arange(K) < K_real).astype(jnp.float32)
    NBu = bnd_rb.shape[0]
    idxg = jnp.clip(bnd_rb - 1, 0, G - 1)
    idx_bn = jnp.concatenate([idxg] * 3, axis=1)       # [NBu, BN]
    a4 = jnp.take_along_axis(
        alphas, idx_bn[:, :, None], axis=0
    ).reshape(NBu, 3, B, K)
    b4 = jnp.take_along_axis(
        beta, idx_bn[:, :, None], axis=0
    ).reshape(NBu, 3, B, K)
    cmat = jnp.einsum("jibk,jlbk->jbil", a4, b4 * km)
    oh = jax.nn.one_hot(jnp.clip(Hc_pad, 0, 7), 8, dtype=jnp.float32)
    oh = oh * valid[..., None].astype(jnp.float32)     # [G, W, B, 8]
    per_g = oh.sum(axis=1)                             # [G, B, 8]
    sfx_cum = jnp.cumsum(per_g[::-1], axis=0)[::-1]
    ns_sel = jnp.take_along_axis(
        sfx_cum, jnp.clip(bnd_rb, 0, G - 1)[:, :, None], axis=0
    )                                                  # [NBu, B, 8]
    sig_seq = _compose_suffix_perms(
        cmat, ns_sel, block_u_j0, bnd_rb, clp, perm_mask
    )
    perm_g = _perm_of_grid(sig_seq, bnd_rb, G)         # [G, B]
    invs_t = jnp.asarray(nipt_tables.INVS)
    perms_t = jnp.asarray(nipt_tables.PERMS)
    clsperm_t = jnp.asarray(nipt_tables.CLASS_PERM)
    inv_sel = jnp.transpose(invs_t[perm_g], (0, 2, 1))  # [G, 3, B]
    out = []
    for arr in (lemg, beta, alphas):
        a = arr.reshape(G, 3, B, K)
        out.append(
            jnp.take_along_axis(a, inv_sel[:, :, :, None], axis=1)
            .reshape(G, BN, K)
        )
    lemg, beta, alphas = out
    perm_w = perm_g[:, None, :]                        # [G, 1, B]
    # labels/classes relabel only on live slots (the sequential loop's
    # cond_rw = suffix & valid; suffix is handled by the identity perm)
    H_new = perms_t[perm_w, jnp.clip(H_pad, 0, 2)].astype(jnp.int32)
    H_pad = jnp.where(valid, H_new, H_pad)
    Hc_new = clsperm_t[perm_w, Hc_pad].astype(jnp.int32)
    Hc_pad = jnp.where(valid, Hc_new, Hc_pad)
    return lemg, beta, alphas, H_pad, Hc_pad


@functools.partial(
    jax.jit,
    static_argnames=(
        "nl", "iterative_init", "K_real", "n_its", "do_block", "prior_t",
        "ref_error", "do_entire", "block_within", "quantile_prob",
    ),
)
def _gibbs_core_pallas(
    em_all,           # [B, K, R] f32 eMatRead (probability domain) or None
    lem_in,           # [B, K, R] f32 log eMatRead (rescaled+floored) or None
    skip_in,          # [B, R] bool uninformative-read flags or None
    bits,             # [B, K, S] uint8
    r_pad,            # [G, W, B] int32 (-1 = empty slot)
    cnt_max,          # [G, 1] int32
    idx_bGW,          # [B, G*W] int32 (clipped gather index into R)
    idx_back,         # [B, R] int32 (flat G*W slot of each read)
    trans,            # [G, 2] f32
    uniforms,         # [n_its, B, R] f32
    H0,               # [B, R] int32
    first_read,       # [B] int32
    boundaries,       # [NB] int32
    block_u,          # [n_its, NB, 3, B] f32
    valid_r,          # [B, R] bool (read_mask)
    relabel_u,        # [n_its, B] f32
    rlc,              # [7, 3] f32
    clp,              # [8] f32
    perm_mask,        # [6] f32
    nl, iterative_init, K_real, n_its, do_block, prior_t, ref_error,
    do_entire, resample_u=None, block_within=True, smooth_w=None,
    quantile_prob=0.95,
):
    if em_all is not None:
        B, K, R = em_all.shape
    else:
        B, K, R = lem_in.shape
    G, W = r_pad.shape[0], r_pad.shape[1]
    BN = nl * B
    bits_packed = bits.dtype != jnp.uint8
    S = bits.shape[2] * (32 if bits_packed else 1)
    # log emission + uninformative-read skip mask, fused into this jit so
    # the dispatch path issues ONE device call per sweep; the batched
    # engine passes precomputed log emissions from its per-batch
    # whole-panel matmul cache instead
    if em_all is not None:
        lem_all = jnp.log(em_all)
        skip_r = (
            em_all.max(axis=1) - em_all.min(axis=1) <= 1e-9
        ) | ~valid_r
    else:
        lem_all = lem_in
        skip_r = skip_in | ~valid_r
    prior = jnp.asarray(prior_t, dtype=jnp.float32)
    log_prior = jnp.log(prior)
    trans_t = jnp.transpose(trans)                          # (2, G) for SMEM
    cnt_t = jnp.transpose(cnt_max)                          # (1, G)
    km = (jnp.arange(K) < K_real).astype(jnp.float32)

    # ---- grid-padded layouts ----
    valid = r_pad >= 0                                      # [G, W, B]
    lem_bRK = jnp.transpose(lem_all, (0, 2, 1))             # [B, R, K]
    gath = jnp.take_along_axis(lem_bRK, idx_bGW[:, :, None], axis=1)
    lem_pad = jnp.transpose(
        gath.reshape(B, G, W, K), (1, 2, 0, 3)
    )                                                       # [G, W, B, K]
    lem_pad = jnp.where(valid[..., None], lem_pad, 0.0)
    lem_dtype = jnp.bfloat16 if not _interpret() else jnp.float32
    lem_pad = lem_pad.astype(lem_dtype)

    def to_slots(x, fill):
        g = jnp.take_along_axis(x, idx_bGW, axis=1)         # [B, G*W]
        g = jnp.transpose(g).reshape(G, W, B)
        return jnp.where(valid, g, fill)

    u_pad = jnp.stack([
        to_slots(uniforms[it].astype(jnp.float32), 0.0) for it in range(n_its)
    ])
    H_pad = to_slots(H0, 0)
    skip_pad = to_slots(
        skip_r.astype(jnp.int32), 1
    )                                                       # empty slots skip
    first_col = first_read[:, None].astype(jnp.int32)

    # ---- initial state ----
    if iterative_init:
        lemg = jnp.zeros((G, BN, K), dtype=jnp.float32)
    else:
        oh = jax.nn.one_hot(H_pad, nl, dtype=jnp.float32)
        oh = oh * valid.astype(jnp.float32)[..., None]
        lemg = jnp.einsum(
            "gwbn,gwbk->gnbk", oh, lem_pad.astype(jnp.float32)
        ).reshape(G, BN, K)
    beta = jnp.ones((G, BN, K), dtype=jnp.float32)
    alphas = jnp.zeros((G, BN, K), dtype=jnp.float32)
    uf = jnp.zeros((B, 1), dtype=jnp.float32)
    from .gibbs import (
        PER_IT_COLS, _boundaries_from_rate, _entire_probs, _log_dmultinom,
        _sample_idx,
    )
    per_it_ll = jnp.zeros((n_its, B, len(PER_IT_COLS)), dtype=jnp.float32)
    NB = boundaries.shape[0]
    Hc_pad = jnp.zeros((G, W, B), dtype=jnp.int32)
    live = valid & ~(skip_pad > 0)                          # [G, W, B]
    prior = jnp.asarray(prior_t, dtype=jnp.float32)
    validf = valid.astype(jnp.float32)

    def counts_of(Hp):
        oh = jax.nn.one_hot(jnp.clip(Hp, 0, nl - 1), nl, dtype=jnp.float32)
        return (oh * validf[..., None]).sum(axis=(0, 1))    # [B, nl]

    lab = counts_of(H_pad)

    for it in range(n_its):
        if iterative_init and it <= 1:
            it_mode = it
        else:
            it_mode = 2
        # alphas are consumed only on block-move / relabelling / final
        # iterations; elsewhere the fwd kernel skips streaming the
        # [G, BN, K] planes back to HBM entirely
        want_alpha = bool(
            do_block[it] or it == n_its - 1 or do_entire
            or (nl == 3 and it == n_its - 1)
        )
        slots_it = jnp.stack(
            [
                jax.lax.bitcast_convert_type(u_pad[it], jnp.int32),
                H_pad, skip_pad, r_pad,
            ],
            axis=1,
        )                                                   # [G, 4, W, B]
        lemg, alphas, H_pad, logc, uf_it, lab = _fwd_sweep(
            lemg, beta, lem_pad, slots_it, first_col, lab, trans_t, cnt_t,
            nl=nl, K_real=K_real, it_mode=it_mode, prior=prior_t,
            want_alpha=want_alpha,
        )
        uf = jnp.maximum(uf, uf_it)
        beta = _bwd_sweep(lemg, trans_t, nl=nl, K_real=K_real)
        relabel = jnp.ones((B,), dtype=jnp.int32)
        if nl == 3 and (do_block[it] or it == n_its - 1 or do_entire):
            Hc_pad = _compute_Hclass_padded(
                alphas, beta, lem_pad, H_pad, live, prior, rlc
            )
        use_otf = smooth_w is not None
        NBu = block_u.shape[1]
        if do_block[it] and ((NB > 0) or (use_otf and NBu > 0)):
            if use_otf:
                # on-the-fly per-row boundaries from the live FB state
                # (reference: Rcpp_define_blocked_snps_using_gamma_on_the_
                # fly, called per block iteration at gibbs-nipt.cpp:3009)
                include3 = nl == 3 and prior_t[2] > 0
                rate2 = _live_jump_rate_padded(
                    alphas, beta, lemg, trans_t, nl, B, K_real, include3
                )
                bnd_rb = _boundaries_from_rate(
                    rate2, smooth_w, NBu, quantile_prob
                )
            else:
                bnd_rb = None
            if nl == 3 and block_within:
                # production within-block move set (shared implementation,
                # kernels/gibbs.py:nipt_block_within) on the padded layout
                from .gibbs import nipt_block_within

                lemg4 = jnp.transpose(
                    lemg.reshape(G, nl, B, K), (0, 2, 1, 3)
                )
                beta4 = jnp.transpose(
                    beta.reshape(G, nl, B, K), (0, 2, 1, 3)
                )
                H_rb = H_pad.reshape(G * W, B)
                Hc_rb = Hc_pad.reshape(G * W, B)
                wif_slots = jnp.broadcast_to(
                    jnp.repeat(jnp.arange(G, dtype=jnp.int32), W)[None, :],
                    (B, G * W),
                )
                # valid (not live): uninformative reads carry class 0 and
                # RESAMPLE from the class prior like every other read (the
                # reference's resample_H_using_H_class covers them; the
                # XLA path does the same)
                mask_rb = jnp.transpose(valid.reshape(G * W, B))

                def rebuild(Hn):
                    Hp = Hn.reshape(G, W, B)
                    oh = jax.nn.one_hot(Hp, nl, dtype=jnp.float32)
                    oh = oh * valid.astype(jnp.float32)[..., None]
                    lg = jnp.einsum(
                        "gwbn,gwbk->gnbk", oh,
                        lem_pad.astype(jnp.float32),
                    )
                    return jnp.transpose(lg, (0, 2, 1, 3))

                ru_it = None
                if resample_u is not None:
                    ru_slot = to_slots(resample_u[it], 0.0)   # [G, W, B]
                    ru_it = jnp.transpose(ru_slot.reshape(G * W, B))
                lemg4, beta4, _al4, H_rb, Hc_rb = nipt_block_within(
                    lemg4, beta4, H_rb, Hc_rb, wif_slots, mask_rb, None,
                    trans, bnd_rb if use_otf else boundaries,
                    block_u[it], clp, perm_mask, rlc,
                    K_real, resample_u_it=ru_it, rebuild_fn=rebuild,
                )
                lemg = jnp.transpose(lemg4, (0, 2, 1, 3)).reshape(G, BN, K)
                beta = jnp.transpose(beta4, (0, 2, 1, 3)).reshape(G, BN, K)
                alphas = jnp.transpose(_al4, (0, 2, 1, 3)).reshape(
                    G, BN, K
                )
                H_pad = H_rb.reshape(G, W, B)
                Hc_pad = Hc_rb.reshape(G, W, B)
                lab = counts_of(H_pad)
            elif nl == 3:
                if use_otf:
                    (lemg, beta, alphas, H_pad,
                     Hc_pad) = _suffix_nipt_composed_padded(
                        lemg, beta, alphas, H_pad, Hc_pad, valid, bnd_rb,
                        block_u[it, :, 0], clp, perm_mask, B, K_real,
                    )
                else:
                    (lemg, beta, alphas, H_pad,
                     Hc_pad) = _block_moves_nipt_padded(
                        lemg, beta, alphas, H_pad, Hc_pad, valid,
                        boundaries, block_u[it], B, K_real, clp, perm_mask,
                    )
                lab = counts_of(H_pad)
            else:
                if use_otf:
                    lemg, beta, alphas, H_pad = _suffix_pair_composed_padded(
                        lemg, beta, alphas, H_pad, bnd_rb,
                        block_u[it, :, 0], nl, B, K_real,
                    )
                else:
                    lemg, beta, alphas, H_pad = _block_moves_padded(
                        lemg, beta, alphas, H_pad, valid, boundaries,
                        block_u[it], nl, B, K_real, log_prior,
                    )
                lab = counts_of(H_pad)
        if do_entire and nl == 3:
            # entire relabelling (rcpp_consider_and_try_entire_relabelling,
            # gibbs-nipt.cpp:1553-1577)
            oh = jax.nn.one_hot(jnp.clip(H_pad, 0, 2), 3, dtype=jnp.float32)
            rc = (oh * valid[..., None]).sum(axis=(0, 1))   # [B, 3]
            probs = _entire_probs(rc, log_prior)
            chosen = _sample_idx(probs, relabel_u[it])
            all_g = jnp.ones((G, B), dtype=bool)
            lemg, beta, alphas, H_pad, Hc_pad = _apply_perm3_padded(
                chosen, all_g, valid, lemg, beta, alphas, H_pad, Hc_pad
            )
            relabel = chosen + 1
            lab = counts_of(H_pad)
        p_O_h = jnp.transpose(logc.reshape(nl, B))          # [B, nl]
        p_O = p_O_h.sum(axis=1)
        # per-iteration label stats from the kernel-tracked counts: no
        # [G, W, B] pass per sweep
        p_H = (lab * jnp.log(prior)[None, :]).sum(axis=1)
        p_set = _log_dmultinom(lab, prior)
        p_O3 = p_O_h[:, 2] if nl == 3 else jnp.zeros_like(p_O)
        row = jnp.stack(
            [
                p_O_h[:, 0], p_O_h[:, 1], p_O3, p_O, p_H, p_O + p_H,
                p_set, relabel.astype(jnp.float32),
            ],
            axis=1,
        )
        per_it_ll = per_it_ll.at[it].set(row)

    # ---- outputs ----
    H_flat = jnp.transpose(H_pad.reshape(G * W, B))         # [B, G*W]
    H_out = jnp.take_along_axis(H_flat, idx_back, axis=1)
    H_out = jnp.where(valid_r, H_out, 0).astype(jnp.int32)
    Hc_flat = jnp.transpose(Hc_pad.reshape(G * W, B))
    Hc_out = jnp.take_along_axis(Hc_flat, idx_back, axis=1)
    Hc_out = jnp.where(valid_r, Hc_out, 0).astype(jnp.int32)

    if bits_packed:
        words_T = jnp.transpose(bits, (2, 0, 1)).astype(jnp.int32)
        hd_g = _dosage_sweep(
            alphas, beta, words_T, nl=nl, K_real=K_real,
            ref_error=float(ref_error),
        )                                                   # [G, BN, 32]
        hap_dos = (
            hd_g.reshape(G, nl, B, 32)
            .transpose(2, 1, 0, 3)
            .reshape(B, nl, S)
        )
    else:
        def dos_step(_, g):
            a = jax.lax.dynamic_index_in_dim(alphas, g, 0, False)
            bt = jax.lax.dynamic_index_in_dim(beta, g, 0, False)
            gam = (a * bt * km[None, :]).reshape(nl, B, K)
            gam = jnp.transpose(gam, (1, 0, 2))
            gam = gam / jnp.maximum(gam.sum(axis=2, keepdims=True), 1e-30)
            bits_g = jax.lax.dynamic_slice(
                bits, (0, 0, g * 32), (B, K, 32)
            )
            e_g = (
                bits_g.astype(jnp.float32) * (1.0 - 2.0 * ref_error)
                + ref_error
            )
            hd = jnp.einsum("bhk,bks->bhs", gam, e_g)
            return None, hd

        _, hd = jax.lax.scan(dos_step, None, jnp.arange(G))
        hap_dos = hd.transpose(1, 2, 0, 3).reshape(B, nl, S)
    gp = jnp.stack(
        [
            (1 - hap_dos[:, 0]) * (1 - hap_dos[:, 1]),
            hap_dos[:, 0] * (1 - hap_dos[:, 1])
            + (1 - hap_dos[:, 0]) * hap_dos[:, 1],
            hap_dos[:, 0] * hap_dos[:, 1],
        ],
        axis=1,
    )
    if nl == 3:
        gpF = jnp.stack(
            [
                (1 - hap_dos[:, 0]) * (1 - hap_dos[:, 2]),
                hap_dos[:, 0] * (1 - hap_dos[:, 2])
                + (1 - hap_dos[:, 0]) * hap_dos[:, 2],
                hap_dos[:, 0] * hap_dos[:, 2],
            ],
            axis=1,
        )
    else:
        gpF = gp
    return gp, gpF, hap_dos, H_out, per_it_ll, uf[:, 0] > 0, Hc_out


_MAX_PAD_BYTES = 8 << 30     # HBM cap for the grid-padded emission tensor
_VMEM_BUDGET = int(13.5 * (1 << 20))   # of the ~16M Mosaic scoped limit


def padded_layout_ok(inputs, B: int = 8, K: int = 768, nl: int = 2) -> bool:
    """True when the grid-padded layout fits the Pallas kernel's budgets:
    the HBM footprint of the [G, W, B, K] bf16 emission tensor (wastes
    space proportional to max/mean reads-per-grid) and the per-step VMEM
    working set of the fused forward sweep (~6 [BN, K] f32 planes plus the
    double-buffered emission chunk)."""
    W = int(inputs.read_count.max()) if inputs.read_count.size else 0
    if W <= 0:
        return False
    G = int(inputs.G)
    # mirror the kernel's actual slot padding: W is only rounded up to the
    # chunk width when it EXCEEDS one chunk (run_gibbs_chains_pallas)
    W_alloc = W if W <= _MAX_W else _round_up(W, _MAX_W)
    bytes_needed = 2 * G * W_alloc * B * K
    if bytes_needed > _MAX_PAD_BYTES:
        return False
    # 9 f32 [BN, K] planes (double-buffered lemg in/out, beta, alpha_out
    # + scratch) + the double-buffered bf16 slot emissions; calibrated
    # against measured Mosaic VMEM failures (224 rows @ W=4 needs 16.3M)
    vmem_est = 9 * nl * B * K * 4 + 4 * min(W_alloc, _MAX_W) * B * K * 2
    return vmem_est <= _VMEM_BUDGET


def max_pallas_chains(K_pad: int, nl: int, W: int = 16) -> int:
    """Largest chain batch one fused-sweep kernel runs (VMEM envelope);
    bigger batches are split into sub-batches of this size by
    gibbs._run_gibbs_chains_chunked."""
    per_row = 9 * nl * K_pad * 4 + 4 * min(max(W, 1), _MAX_W) * K_pad * 2
    return max(_VMEM_BUDGET // per_row, 1)


def max_hbm_chains(
    K_pad: int, nl: int, W: int = 16, G: int = 512,
    hbm_budget: int = 10 << 30,
) -> int:
    """Largest chain batch whose per-call HBM working set fits the chip
    (the VMEM row ceiling is handled by sub-batch chunking instead). Main
    per-row tensors: the lemg/beta/alpha [G, nl*K] f32 planes (x2 for
    XLA ping-pong), the [G, W, K] bf16 slot emissions, and the
    [K, R~G*3] f32 eMatRead."""
    per_row = (
        2 * 3 * G * nl * K_pad * 4
        + G * max(W, 1) * K_pad * 2
        + K_pad * G * 4 * 4
    )
    return max(hbm_budget // per_row, 8)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def run_gibbs_chains_pallas(
    bits: np.ndarray,
    preads,
    inputs,
    uniforms,
    H0: np.ndarray,
    first_read: np.ndarray,
    n_latent: int,
    ff: float,
    n_burn_in: int,
    iterative_init: bool,
    K_real: int,
    max_diff: float = 1e10,
    ref_error: float = 0.001,
    eMatRead=None,
    boundaries=None,
    block_u=None,
    do_block=None,
    relabel_u=None,
    do_entire=False,
    resample_u=None,
    block_within=None,
    smooth_w=None,
    quantile_prob=0.95,
    return_arrays=True,
    lem_read=None,
):
    """Drop-in replacement for kernels.gibbs.run_gibbs_chains on TPU.

    lem_read: optional (lem [B, K, R] f32, skip [B, R] bool) pair of
    precomputed rescaled/floored log emissions (the batched engine's
    per-batch whole-panel matmul cache); skips the per-call eMatRead
    build entirely."""
    from . import nipt as nipt_tables
    from .emissions import emat_read_from_bits

    B, K, Sb = np.shape(bits)
    n_its = uniforms.shape[0]
    if n_latent == 2:
        prior_t = (0.5, 0.5)
    else:
        prior_t = (0.5, (1 - ff) / 2, ff / 2)
    if not isinstance(bits, jax.Array):
        bits = jnp.asarray(bits)
    R = inputs.R
    G = inputs.G
    if eMatRead is None and lem_read is None:
        # device-resident read tensors cached on the PaddedReads object —
        # the engine reuses one PaddedReads across the whole seek loop, so
        # the [B, R, J] uploads cross the host link once per region
        pdev = getattr(preads, "_dev_cache", None)
        if pdev is None:
            pdev = {
                "u_pad": jnp.asarray(preads.u_pad),
                "lr": jnp.asarray(preads.lr),
                "la": jnp.asarray(preads.la),
            }
            try:
                object.__setattr__(preads, "_dev_cache", pdev)
            except (AttributeError, TypeError):
                pass
        eMatRead = emat_read_from_bits(
            bits, pdev["u_pad"], pdev["lr"], pdev["la"], max_diff, R_out=R,
        )

    # slot index arrays: identical across every call sharing one
    # GibbsInputs (the whole seek loop), so build + upload once
    cache = getattr(inputs, "_pallas_dev", None)
    if cache is None or cache.get("B") != B:
        rs_np, rc_np, w_np, m_np = (
            inputs.read_start, inputs.read_count, inputs.wif0,
            inputs.read_mask,
        )
        if rs_np.shape[0] == 1 and B > 1:
            rs_np = np.broadcast_to(rs_np, (B, G))
            rc_np = np.broadcast_to(rc_np, (B, G))
            w_np = np.broadcast_to(w_np, (B, R))
            m_np = np.broadcast_to(m_np, (B, R))
        W = max(int(rc_np.max()), 1)
        if W > _MAX_W:
            W = _round_up(W, _MAX_W)  # slot axis tiled in _MAX_W chunks
        ar_w = np.arange(W, dtype=np.int32)
        idx = rs_np[:, :, None] + ar_w[None, None, :]        # [B, G, W]
        in_cnt = ar_w[None, None, :] < rc_np[:, :, None]
        r_pad = np.where(in_cnt, idx, -1).astype(np.int32)
        r_pad = np.transpose(r_pad, (1, 2, 0))               # [G, W, B]
        idx_bGW = np.clip(
            np.transpose(r_pad, (2, 0, 1)).reshape(B, G * W), 0, R - 1
        ).astype(np.int32)
        cnt_max = rc_np.max(axis=0).astype(np.int32)[:, None]  # [G, 1]
        # inverse map read -> slot
        g_of_r = np.clip(w_np, 0, G - 1).astype(np.int64)
        i_of_r = np.arange(R)[None, :] - np.take_along_axis(
            rs_np.astype(np.int64), g_of_r, axis=1
        )
        i_of_r = np.clip(i_of_r, 0, W - 1)
        idx_back = (g_of_r * W + i_of_r).astype(np.int32)    # [B, R]
        cache = {
            "B": B, "W": W,
            "r_pad": jnp.asarray(r_pad),
            "cnt_max": jnp.asarray(cnt_max),
            "idx_bGW": jnp.asarray(idx_bGW),
            "idx_back": jnp.asarray(idx_back),
            "trans": jnp.asarray(inputs.trans),
            "mask": jnp.asarray(m_np),
        }
        try:
            object.__setattr__(inputs, "_pallas_dev", cache)
        except (AttributeError, TypeError):
            pass
    W = cache["W"]

    if boundaries is None or len(boundaries) == 0:
        boundaries = np.zeros(0, dtype=np.int32)
        if smooth_w is None:
            block_u = None
    if block_u is None:
        block_u = np.zeros((n_its, 0, 3, B), dtype=np.float32)
        do_block = np.zeros(n_its, dtype=bool)
    if do_block is None:
        do_block = np.zeros(n_its, dtype=bool)
    do_block_t = tuple(bool(x) for x in np.asarray(do_block))
    if relabel_u is None:
        relabel_u = np.zeros((n_its, B), dtype=np.float32)
    if n_latent == 3:
        rlc = nipt_tables.make_rlc(ff).astype(np.float32)
        clp = nipt_tables.class_log_p(ff).astype(np.float32)
        perm_mask = np.ones(6, dtype=np.float32)
        if ff <= 0.0:
            perm_mask[[1, 3, 4, 5]] = 0.0
    else:
        rlc = np.zeros((7, 3), dtype=np.float32)
        clp = np.zeros(8, dtype=np.float32)
        perm_mask = np.ones(6, dtype=np.float32)

    gp, gpF, hap_dos, H, ll, uf, H_class = _gibbs_core_pallas(
        eMatRead,
        lem_read[0] if lem_read is not None else None,
        lem_read[1] if lem_read is not None else None,
        bits,
        cache["r_pad"],
        cache["cnt_max"],
        cache["idx_bGW"],
        cache["idx_back"],
        cache["trans"],
        jnp.asarray(uniforms, dtype=jnp.float32),
        jnp.asarray(H0, dtype=jnp.int32),
        jnp.asarray(first_read, dtype=jnp.int32),
        jnp.asarray(boundaries, dtype=jnp.int32),
        jnp.asarray(block_u, dtype=jnp.float32),
        cache["mask"],
        jnp.asarray(relabel_u, dtype=jnp.float32),
        jnp.asarray(rlc),
        jnp.asarray(clp),
        jnp.asarray(perm_mask),
        nl=n_latent,
        iterative_init=iterative_init,
        K_real=K_real,
        n_its=n_its,
        do_block=do_block_t,
        prior_t=prior_t,
        ref_error=float(ref_error),
        do_entire=bool(do_entire),
        resample_u=(
            jnp.asarray(resample_u, dtype=jnp.float32)
            if resample_u is not None else None
        ),
        block_within=_block_within_default_pallas(block_within),
        smooth_w=(tuple(jnp.asarray(x) for x in smooth_w)
                  if smooth_w is not None else None),
        quantile_prob=float(quantile_prob),
    )
    if not return_arrays:
        return gp, gpF, hap_dos, H, ll, uf, H_class
    return (
        np.asarray(gp),
        np.asarray(gpF),
        np.asarray(hap_dos),
        np.asarray(H),
        np.asarray(ll),
        np.asarray(uf),
        np.asarray(H_class),
    )
