"""Multi-chip execution: device mesh and the panel-sharded full-panel FB.

The reference's only concurrency is fork-per-sample (QUILT/R/quilt.R:692);
the TPU-native equivalents are:

- `data` mesh axis: independent samples/chains batch-parallel (embarrassingly
  parallel, DCN-friendly across hosts);
- `panel` mesh axis: the K reference-haplotype axis of the full-panel FB
  sharded over ICI. Each grid step needs one global sum over K (the
  Li & Stephens jump mass) — a [B]-vector psum per scan step riding ICI —
  plus a psum for the per-grid normalizer. Dosage partials reduce with a
  psum at the end; top-K candidates merge via all_gather of per-shard top-K.

This mirrors the north-star decomposition in BASELINE.json and SURVEY.md
section 2.7.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.fb_full import FBInputs


def make_mesh(n_data: int, n_panel: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_panel, (
        f"need {n_data * n_panel} devices, have {devices.size}"
    )
    devices = devices.flatten()[: n_data * n_panel].reshape(n_data, n_panel)
    return Mesh(devices, ("data", "panel"))


def _fb_sharded_local(
    gl,          # [B_local, 2, S] replicated over panel
    dh,          # [G, K_local]
    ie,          # [D+1, S] replicated
    dh_bits,     # [D, S] replicated
    trans,       # [G, 2] replicated
    K: int,
    K_top: int,
    ref_error: float,
):
    """Per-device body of the panel-sharded FB (runs under shard_map).

    Escape correction is omitted in the sharded path for now: panels meant
    for K-sharding should be prepared with nMaxDH covering the escape mass
    or use the replicated kernel. (Documented deviation; exact path is the
    single-device kernel in kernels/fb_full.py.)
    """
    from ..kernels.emissions import emat_dh_from_gl

    B, _, S = gl.shape
    G = S // 32
    D1 = ie.shape[0]
    eMatDH = emat_dh_from_gl(gl, dh_bits, ref_error)   # [B, G, D+1]

    def emission_at(g):
        dh_g = dh[g]
        table = jax.lax.dynamic_index_in_dim(eMatDH, g, 1, keepdims=False)
        onehot = jax.nn.one_hot(dh_g, D1, dtype=table.dtype, axis=0)
        return table @ onehot                           # [B, K_local]

    def fwd_step(alpha, g):
        t = trans[g]
        e = emission_at(g)
        # trans row 0 is (1, 1): with zero alpha carry this yields the
        # uniform prior e/K at the first grid
        a_raw = (t[0] * alpha + t[1] / K) * e
        # global normalizer across the panel axis
        s = jax.lax.psum(a_raw.sum(axis=1), axis_name="panel")   # [B]
        s = jnp.maximum(s, 1e-30)
        a = a_raw / s[:, None]
        return a, (a, jnp.log(s))

    alpha0 = jnp.zeros((B, dh.shape[1]), dtype=jnp.float32)
    _, (alphas, log_s) = jax.lax.scan(fwd_step, alpha0, jnp.arange(G))
    log_like = log_s.sum(axis=0)

    def bwd_step(beta, g):
        gn = jnp.minimum(g + 1, G - 1)
        t_next = jax.lax.dynamic_index_in_dim(trans, gn, 0, keepdims=False)
        e_next = emission_at(gn)
        etb = e_next * beta
        tot = jax.lax.psum(etb.sum(axis=1), axis_name="panel")
        b_new = t_next[0] * etb + t_next[1] * tot[:, None] / K
        b_new = jnp.where(g == G - 1, jnp.ones_like(beta), b_new)
        mx = jax.lax.pmax(
            b_new.max(axis=1), axis_name="panel"
        )
        b_new = b_new / jnp.maximum(mx, 1e-30)[:, None]
        alpha_g = jax.lax.dynamic_index_in_dim(alphas, g, 0, keepdims=False)
        gamma = alpha_g * b_new
        gsum = jax.lax.psum(gamma.sum(axis=1), axis_name="panel")
        gamma = gamma / jnp.maximum(gsum, 1e-30)[:, None]
        dh_g = dh[g]
        onehot = jax.nn.one_hot(dh_g, D1, dtype=gamma.dtype, axis=1)
        matched = jax.lax.psum(gamma @ onehot, axis_name="panel")  # [B, D+1]
        ie_g = jax.lax.dynamic_slice(ie, (0, g * 32), (D1, 32))
        dos = matched @ ie_g
        tv_l, ti_l = jax.lax.top_k(gamma, K_top)
        return b_new, (dos, tv_l, ti_l)

    beta0 = jnp.ones((B, dh.shape[1]), dtype=jnp.float32)
    _, (dosage_grids, tv, ti) = jax.lax.scan(
        bwd_step, beta0, jnp.arange(G - 1, -1, -1)
    )
    dosage = dosage_grids[::-1].transpose(1, 0, 2).reshape(B, S)
    # local top-K per grid; offset local indices to global and all_gather
    shard = jax.lax.axis_index("panel")
    ti_global = ti + shard * dh.shape[1]
    tv_all = jax.lax.all_gather(tv[::-1], "panel", axis=2, tiled=True)
    ti_all = jax.lax.all_gather(ti_global[::-1], "panel", axis=2, tiled=True)
    return dosage, log_like, tv_all, ti_all


def fb_full_sharded(
    gl: np.ndarray,
    inputs: FBInputs,
    mesh: Mesh,
    K_top: int = 8,
    ref_error: float = 0.001,
):
    """Run the FB with K sharded over the mesh 'panel' axis and the batch
    over 'data'. Returns (dosage [B, nSNPs], log_like [B],
    top_vals/top_idx [nGrids, B, K_top * n_panel])."""
    n_panel = mesh.shape["panel"]
    K_pad = inputs.K_pad
    K_shard = ((K_pad + n_panel - 1) // n_panel + 127) // 128 * 128
    K_tot = K_shard * n_panel
    dh = np.zeros((inputs.nGrids, K_tot), dtype=np.int32)
    dh[:, :K_pad] = inputs.dh                 # pads -> slot 0 => emission 0
    B = gl.shape[0]
    S = inputs.S
    gl_pad = np.ones((B, 2, S), dtype=np.float32)
    gl_pad[:, :, : gl.shape[2]] = gl

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P("data", None, None), P(None, "panel"), P(None, None),
            P(None, None), P(None, None),
        ),
        out_specs=(P("data", None), P("data"), P(None, "data", None),
                   P(None, "data", None)),
    )
    def run(gl_l, dh_l, ie_l, bits_l, trans_l):
        return _fb_sharded_local(
            gl_l, dh_l, ie_l, bits_l, trans_l,
            K=inputs.K, K_top=K_top, ref_error=ref_error,
        )

    dosage, log_like, tv, ti = run(
        jnp.asarray(gl_pad),
        jnp.asarray(dh),
        jnp.asarray(inputs.ie),
        jnp.asarray(inputs.dh_bits),
        jnp.asarray(inputs.trans),
    )
    return (
        np.asarray(dosage)[:, : inputs.nSNPs],
        np.asarray(log_like),
        np.asarray(tv),
        np.asarray(ti),
    )
