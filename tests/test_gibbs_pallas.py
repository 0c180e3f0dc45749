"""Pallas Gibbs sweep (kernels/gibbs_pallas.py) vs the XLA reference path.

Runs in Pallas interpret mode on the CPU test mesh; on TPU the same code
compiles via Mosaic (exercised by bench/engine runs). The two paths share
all semantics — uniforms are consumed by read index — so labels and
genotype posteriors must agree to fp32 noise.
"""
import os

import numpy as np
import pytest

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, trans_rates
from quilt_tpu.kernels import PaddedReads
from quilt_tpu.kernels.gibbs import GibbsInputs, run_gibbs_chains


def _run_both(nl, ff, with_block, B, seed, iterative=True):
    rng = np.random.default_rng(seed)
    K, nSNPs = 24, 128
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=nl)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=3.0, read_length_bp=600, phred=25,
        ff=ff,
    )
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    n_its = 6
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    p = [0.5, 0.5] if nl == 2 else [0.5, (1 - ff) / 2, ff / 2]
    H0 = rng.choice(nl, size=(B, R), p=p).astype(np.int32)
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits1 = np.zeros((K, S), dtype=np.uint8)
    bits1[:, :nSNPs] = haps
    bits = np.broadcast_to(bits1[None], (B, K, S)).copy()
    first = rng.integers(0, reads.nReads, B).astype(np.int32)
    kw = {}
    if with_block:
        kw["boundaries"] = np.array(
            [nGrids // 3, 2 * nGrids // 3], dtype=np.int32
        )
        kw["block_u"] = rng.random((n_its, 2, 3, B)).astype(np.float32)
        db = np.zeros(n_its, bool)
        db[[2, 4]] = True
        kw["do_block"] = db
        if nl == 3:
            # exercise resample_H_using_H_class in both backends
            kw["resample_u"] = rng.random((n_its, B, R)).astype(np.float32)
    res = {}
    for backend in ["xla", "pallas"]:
        os.environ["QUILT_TPU_GIBBS"] = backend
        try:
            res[backend] = run_gibbs_chains(
                bits=bits, preads=preads, inputs=inputs, uniforms=uniforms,
                H0=H0, first_read=first, n_latent=nl, ff=ff,
                n_burn_in=n_its - 1, iterative_init=iterative, K_real=K,
                **kw,
            )
        finally:
            os.environ.pop("QUILT_TPU_GIBBS", None)
    return res, reads.nReads, nSNPs


@pytest.mark.parametrize(
    "nl,ff,with_block,iterative",
    [
        (2, 0.0, False, True),
        (2, 0.0, True, True),
        (2, 0.0, False, False),
        (3, 0.2, True, True),
    ],
)
def test_pallas_matches_xla(nl, ff, with_block, iterative):
    res, nr, nSNPs = _run_both(
        nl, ff, with_block, B=2, seed=11 + nl, iterative=iterative
    )
    gx, gp = res["xla"], res["pallas"]
    assert not gp[5].any()
    agree = (gx[3][:, :nr] == gp[3][:, :nr]).mean()
    assert agree > 0.995, f"label agreement {agree}"
    dx = gx[0][:, 1, :nSNPs] + 2 * gx[0][:, 2, :nSNPs]
    dp = gp[0][:, 1, :nSNPs] + 2 * gp[0][:, 2, :nSNPs]
    np.testing.assert_allclose(dp, dx, atol=5e-3)
    np.testing.assert_allclose(gp[4], gx[4], rtol=1e-4, atol=1e-3)
    if nl == 3:
        fx = gx[1][:, 1, :nSNPs] + 2 * gx[1][:, 2, :nSNPs]
        fp = gp[1][:, 1, :nSNPs] + 2 * gp[1][:, 2, :nSNPs]
        np.testing.assert_allclose(fp, fx, atol=5e-3)
        cls_agree = (gx[6][:, :nr] == gp[6][:, :nr]).mean()
        assert cls_agree > 0.98, f"H_class agreement {cls_agree}"


def test_pallas_dense_coverage_tiled():
    """Reads-per-grid above the per-chunk VMEM width (W > 64) run through
    the tiled slot axis (2D pallas grid) and still match XLA — the
    round-1 fallback ('_MAX_W = 64') is gone."""
    rng = np.random.default_rng(99)
    nl, ff, B = 2, 0.0, 2
    K, nSNPs = 24, 96
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=nl)
    # very dense coverage: >64 reads overlap some grid
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=40.0, read_length_bp=600, phred=25,
    )
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    inputs = GibbsInputs.build(reads, trans, nGrids)
    assert int(inputs.read_count.max()) > 64, "fixture must exceed one chunk"
    n_its = 4
    R = inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    H0 = rng.choice(nl, size=(B, R)).astype(np.int32)
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits1 = np.zeros((K, S), dtype=np.uint8)
    bits1[:, :nSNPs] = haps
    bits = np.broadcast_to(bits1[None], (B, K, S)).copy()
    first = rng.integers(0, reads.nReads, B).astype(np.int32)
    res = {}
    for backend in ["xla", "pallas"]:
        os.environ["QUILT_TPU_GIBBS"] = backend
        try:
            res[backend] = run_gibbs_chains(
                bits=bits, preads=preads, inputs=inputs, uniforms=uniforms,
                H0=H0, first_read=first, n_latent=nl, ff=ff,
                n_burn_in=n_its - 1, iterative_init=True, K_real=K,
            )
        finally:
            os.environ.pop("QUILT_TPU_GIBBS", None)
    gx, gp = res["xla"], res["pallas"]
    assert not gp[5].any()
    nr = reads.nReads
    agree = (gx[3][:, :nr] == gp[3][:, :nr]).mean()
    assert agree > 0.99, f"label agreement {agree}"
    dx = gx[0][:, 1, :nSNPs] + 2 * gx[0][:, 2, :nSNPs]
    dp = gp[0][:, 1, :nSNPs] + 2 * gp[0][:, 2, :nSNPs]
    np.testing.assert_allclose(dp, dx, atol=5e-3)


def test_chunked_rows_match_single():
    """Oversize chain batches run as Pallas sub-batches
    (gibbs._run_gibbs_chains_chunked); the split is exact row-wise."""
    from quilt_tpu.kernels.gibbs import _run_gibbs_chains_chunked

    rng = np.random.default_rng(7)
    nl, B = 2, 10
    K, nSNPs = 24, 128
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    reads_list = []
    for _ in range(B):
        truth = simulate_truth_mosaic(rng, haps, n_latent=nl)
        r, _ = simulate_sample_reads(
            rng, truth, pos, grid, coverage=2.0, read_length_bp=600,
            phred=25,
        )
        reads_list.append(r.sorted_by_grid())
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    inputs = GibbsInputs.build_batched(reads_list, trans, nGrids)
    preads = PaddedReads.build_batched(reads_list, ref_error=0.001)
    n_its, R = 4, inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    H0 = rng.choice(nl, size=(B, R)).astype(np.int32)
    S = nGrids * 32
    bits1 = np.zeros((K, S), dtype=np.uint8)
    bits1[:, :nSNPs] = haps
    bits = np.broadcast_to(bits1[None], (B, K, S)).copy()
    first = rng.integers(0, 50, B).astype(np.int32)
    kw = dict(
        preads=preads, inputs=inputs, n_latent=nl, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
    )
    os.environ["QUILT_TPU_GIBBS"] = "pallas"
    try:
        ref = run_gibbs_chains(
            bits=bits, uniforms=uniforms, H0=H0, first_read=first, **kw
        )
        chk = _run_gibbs_chains_chunked(
            4, bits=bits, uniforms=uniforms, H0=H0, first_read=first,
            max_diff=1e10, ref_error=0.001, eMatRead=None, boundaries=None,
            block_u=None, do_block=None, relabel_u=None, do_entire=False,
            resample_u=None, block_within=None, smooth_w=None,
            quantile_prob=0.95, return_arrays=True, **kw,
        )
    finally:
        os.environ.pop("QUILT_TPU_GIBBS", None)
    nr = min(r.nReads for r in reads_list)
    assert (ref[3][:, :nr] == chk[3][:, :nr]).mean() > 0.99
    np.testing.assert_allclose(chk[0], ref[0], atol=5e-3)


def test_pallas_packed_bits_matches_xla():
    """PACKED panel words through the fused sweep + dosage kernel (the
    production layout) agree with the XLA path."""
    from quilt_tpu.utils import pack_bits_32

    rng = np.random.default_rng(23)
    nl, B = 2, 3
    K, nSNPs = 24, 128
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=nl)
    reads, _ = simulate_sample_reads(
        rng, truth, pos, grid, coverage=3.0, read_length_bp=600, phred=25,
    )
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    inputs = GibbsInputs.build(reads, trans, nGrids)
    n_its, R = 5, inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    H0 = rng.choice(nl, size=(B, R)).astype(np.int32)
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits1 = np.zeros((K, S), dtype=np.uint8)
    bits1[:, :nSNPs] = haps
    words = pack_bits_32(bits1)
    bits_p = np.broadcast_to(words[None], (B,) + words.shape).copy()
    first = rng.integers(0, reads.nReads, B).astype(np.int32)
    res = {}
    for backend in ["xla", "pallas"]:
        os.environ["QUILT_TPU_GIBBS"] = backend
        try:
            res[backend] = run_gibbs_chains(
                bits=bits_p, preads=preads, inputs=inputs,
                uniforms=uniforms, H0=H0, first_read=first, n_latent=nl,
                ff=0.0, n_burn_in=n_its - 1, iterative_init=True, K_real=K,
            )
        finally:
            os.environ.pop("QUILT_TPU_GIBBS", None)
    gx, gp = res["xla"], res["pallas"]
    nr = reads.nReads
    assert (gx[3][:, :nr] == gp[3][:, :nr]).mean() > 0.995
    dx = gx[0][:, 1, :nSNPs] + 2 * gx[0][:, 2, :nSNPs]
    dp = gp[0][:, 1, :nSNPs] + 2 * gp[0][:, 2, :nSNPs]
    np.testing.assert_allclose(dp, dx, atol=5e-3)
    np.testing.assert_allclose(gp[4], gx[4], rtol=1e-4, atol=1e-3)


def test_lem_read_cache_matches_default():
    """The batched engine's per-batch whole-panel eMatRead cache
    (lem_full_from_cache + lem_subset fed via lem_read=) produces the
    same sweep results as the in-call emission build."""
    import jax.numpy as jnp
    from quilt_tpu.kernels.emissions import (
        ReadWindowCache, expand_panel_bf16, lem_full_from_cache, lem_subset,
    )
    from quilt_tpu.utils import pack_bits_32

    rng = np.random.default_rng(31)
    nl, B = 2, 3
    K, nSNPs = 24, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, truth_haps := haps, n_latent=nl)
    reads, _ = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=600, phred=25,
    )
    reads = reads.sorted_by_grid()
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    inputs = GibbsInputs.build(reads, trans, nGrids)
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits1 = np.zeros((K, S), dtype=np.uint8)
    bits1[:, :nSNPs] = haps
    words = pack_bits_32(bits1)
    bits_p = np.broadcast_to(words[None], (B,) + words.shape).copy()
    n_its, R = 4, inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    H0 = rng.choice(nl, size=(B, R)).astype(np.int32)
    first = rng.integers(0, reads.nReads, B).astype(np.int32)
    # per-batch cache exactly as engine/batch.py builds it
    wc = ReadWindowCache(
        preads.u_pad[None], preads.lpr[None], preads.lpa[None],
        preads.mask[None], nGrids, lr=preads.lr[None], la=preads.la[None],
        Rc=64,
    )
    dh, dl = wc.diff
    E_full = expand_panel_bf16(jnp.asarray(words))
    lem_full = lem_full_from_cache(
        E_full, dh, dl, wc.base, wc.s0, wc.Rc, wc.Swin
    )
    flat_idx = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None], (B, K)
    )
    lem_pair = lem_subset(lem_full, flat_idx, 1e10, R)
    kw = dict(
        bits=bits_p, preads=preads, inputs=inputs, uniforms=uniforms,
        H0=H0, first_read=first, n_latent=nl, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
    )
    os.environ["QUILT_TPU_GIBBS"] = "pallas"
    try:
        ref = run_gibbs_chains(**kw)
        got = run_gibbs_chains(**kw, lem_read=lem_pair)
    finally:
        os.environ.pop("QUILT_TPU_GIBBS", None)
    nr = reads.nReads
    assert (ref[3][:, :nr] == got[3][:, :nr]).mean() > 0.995
    np.testing.assert_allclose(got[0], ref[0], atol=5e-3)
