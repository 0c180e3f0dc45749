"""The fused Pallas FB (interpret mode on CPU) must match the XLA path.

On TPU hardware the Pallas kernel is the production path (bench.py); these
tests pin its numerics against the XLA implementation (itself oracle-tested
in test_kernel_fb.py) so both stay interchangeable.
"""
import os

import numpy as np
import pytest

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, compress_panel, trans_rates
from quilt_tpu.utils import pack_bits_32
from quilt_tpu.kernels import FBInputs, fb_full_batched
from quilt_tpu.oracle import haploid_dosage_versus_refs, make_gl_from_reads


@pytest.fixture
def world(rng):
    K, nSNPs, nMaxDH = 90, 333, 8
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    panel = compress_panel(rhb_t, nSNPs, ref_error=0.001, nMaxDH=nMaxDH)
    trans = trans_rates(rng.uniform(0.95, 0.999, nGrids - 1))
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=1500, phred=25
    )
    gls = [
        make_gl_from_reads(reads, np.flatnonzero(sim.labels == h), nSNPs)
        for h in (0, 1)
    ]
    return panel, trans, np.stack(gls).astype(np.float32), nGrids


def _run(mode, gl_b, inputs):
    prev = os.environ.get("QUILT_FB")
    os.environ["QUILT_FB"] = mode
    try:
        return fb_full_batched(gl_b, inputs, K_top=8)
    finally:
        if prev is None:
            os.environ.pop("QUILT_FB", None)
        else:
            os.environ["QUILT_FB"] = prev


def test_pallas_matches_xla(world):
    panel, trans, gl_b, nGrids = world
    assert len(panel.esc_k) > 0    # exercise escape words in the bit matrix
    thinned = np.array([1, 4, 8])
    inputs = FBInputs.build(panel, trans, thinned_grids=thinned)
    inputs.capture_grid = 5
    d1, l1, tv1, ti1, g1 = _run("xla", gl_b, inputs)
    d2, l2, tv2, ti2, g2 = _run("interpret", gl_b, inputs)
    # the XLA path's bf16 one-hot matmuls carry ~1e-3 error themselves;
    # the Pallas hi/lo-split path measures ~2e-6 vs the float64 oracle
    np.testing.assert_allclose(d1, d2, atol=3e-3)
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=0.01)
    np.testing.assert_allclose(tv1, tv2, atol=1e-3)
    np.testing.assert_allclose(g1, g2, atol=1e-3)
    # top-K indices agree wherever values are not near-ties
    gap = tv1[thinned, :, :-1] - tv1[thinned, :, 1:]
    firm = gap > 1e-3
    assert (
        ti1[thinned, :, :-1][firm] == ti2[thinned, :, :-1][firm]
    ).mean() > 0.99


def test_pallas_matches_oracle(world):
    panel, trans, gl_b, nGrids = world
    orc = haploid_dosage_versus_refs(
        gl_b[0].astype(np.float64), panel, trans, ref_error=0.001
    )
    inputs = FBInputs.build(panel, trans)
    d2, l2, _, _ = _run("interpret", gl_b, inputs)
    np.testing.assert_allclose(d2[0], orc.dosage, atol=1e-4)
    assert abs(l2[0] - orc.log_like) < 1e-2


def test_tiled_matches_xla(world, rng, monkeypatch):
    """K-tiled kernels (multi-tile via a small K_TILE) == XLA path."""
    import quilt_tpu.kernels.fb_pallas as fbp

    monkeypatch.setattr(fbp, "K_TILE", 64)
    panel, trans, gls, nGrids = world
    inputs = FBInputs.build(
        panel, trans, thinned_grids=np.arange(0, nGrids, 3)
    )
    # gls is [2, 2, nSNPs] (two latent haps' GL pairs); batch 3 rows
    gl_b = np.stack([gls[i % 2] for i in range(3)])
    dos_x, ll_x, tv_x, ti_x = _run("xla", gl_b, inputs)

    from quilt_tpu.kernels.fb_pallas import fb_pallas_tiled_core
    import jax.numpy as jnp

    S = inputs.S
    gl_pad = np.ones((gl_b.shape[0], 2, S), dtype=np.float32)
    gl_pad[:, :, : gl_b.shape[2]] = gl_b
    dev = inputs.device()
    dos_t, ll_t, tv_t, ti_t, _ = fb_pallas_tiled_core(
        jnp.asarray(gl_pad), dev["words"], dev["trans2"],
        dev["thin_flag"], dev["capture_flag"],
        K=inputs.K, K_pad=inputs.K_pad, K_top=8,
        ref_error=0.001, interpret=True,
    )
    dos_t = np.asarray(dos_t)[:, : inputs.nSNPs]
    np.testing.assert_allclose(dos_t, dos_x, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ll_t), ll_x, rtol=1e-3, atol=1e-2
    )
    # top-K at thinned grids: same gamma mass on the selected haps
    thin_g = np.flatnonzero(inputs.thin_flag >= 0)
    tv_t = np.asarray(tv_t)
    for g in thin_g[:6]:
        np.testing.assert_allclose(
            np.sort(tv_t[g], axis=1), np.sort(np.asarray(tv_x[g]), axis=1),
            rtol=5e-3, atol=5e-4,
        )
