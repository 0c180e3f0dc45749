import numpy as np
import jax

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, compress_panel, trans_rates
from quilt_tpu.utils import pack_bits_32
from quilt_tpu.kernels import FBInputs, fb_full_batched
from quilt_tpu.oracle import make_gl_from_reads
from quilt_tpu.dist import make_mesh, fb_full_sharded


def _world(rng, K=96, nSNPs=320, nMaxDH=96):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    panel = compress_panel(rhb_t, len(pos), nMaxDH=nMaxDH)
    trans = trans_rates(np.full(nGrids - 1, 0.99))
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=1000
    )
    gls = []
    for h in (0, 1):
        which = np.flatnonzero(sim.labels == h)
        gls.append(make_gl_from_reads(reads, which, len(pos)))
    gl_b = np.stack(gls * 2).astype(np.float32)     # B=4 (2 data shards)
    return panel, trans, gl_b, nGrids


def test_fb_sharded_matches_replicated(rng):
    assert len(jax.devices()) >= 8
    panel, trans, gl_b, nGrids = _world(rng, nMaxDH=96)
    assert len(panel.esc_k) == 0
    inputs = FBInputs.build(panel, trans)
    dosage_ref, ll_ref, _, _ = fb_full_batched(gl_b, inputs, K_top=8)
    mesh = make_mesh(2, 4)
    dosage_sh, ll_sh, tv, ti = fb_full_sharded(gl_b, inputs, mesh, K_top=4)
    np.testing.assert_allclose(dosage_sh, dosage_ref, atol=3e-3)
    np.testing.assert_allclose(ll_sh, ll_ref, rtol=1e-3, atol=0.5)
    assert tv.shape[2] == 16  # 4 shards x K_top 4


def test_fb_sharded_exact_with_escapes_and_thinning(rng):
    """The sharded kernel is the exact algorithm: escape-COO corrections
    applied, top-K only at thinned grids, merged lists in global rank
    order equal to the single-device kernel's."""
    assert len(jax.devices()) >= 8
    # small nMaxDH forces plenty of escape entries
    panel, trans, gl_b, nGrids = _world(rng, nMaxDH=8)
    assert len(panel.esc_k) > 0
    thinned = np.arange(0, nGrids, 3)
    inputs = FBInputs.build(panel, trans, thinned_grids=thinned)
    dosage_ref, ll_ref, tv_ref, ti_ref = fb_full_batched(
        gl_b, inputs, K_top=8
    )
    mesh = make_mesh(2, 4)
    dosage_sh, ll_sh, tv_sh, ti_sh = fb_full_sharded(
        gl_b, inputs, mesh, K_top=8
    )
    np.testing.assert_allclose(dosage_sh, dosage_ref, atol=3e-3)
    np.testing.assert_allclose(ll_sh, ll_ref, rtol=1e-3, atol=0.5)
    # top-K gating: non-thinned grids must be all-zero in both
    thin_mask = np.zeros(inputs.nGrids, dtype=bool)
    thin_mask[thinned] = True
    assert (tv_sh[~thin_mask] == 0).all()
    # at thinned grids the merged global top-8 must match the
    # single-device top-8 (same haplotypes, near-same gammas)
    for g in thinned[:5]:
        for b in range(gl_b.shape[0]):
            ref_set = set(ti_ref[g, b].tolist())
            sh_set = set(ti_sh[g, b, :8].tolist())
            overlap = len(ref_set & sh_set)
            assert overlap >= 7, (g, b, ref_set, sh_set)
            np.testing.assert_allclose(
                tv_sh[g, b, :8], tv_ref[g, b], atol=2e-3
            )


def test_fb_sharded_gamma_capture(rng):
    """Gamma capture (hla_run) on the panel-sharded FB equals the
    single-device kernel's captured gamma (the r3 assert blocking HLA on
    the mesh is lifted; reference gamma hook functions.R:1261-1280)."""
    assert len(jax.devices()) >= 8
    panel, trans, gl_b, nGrids = _world(rng, nMaxDH=96)
    inputs = FBInputs.build(panel, trans)
    inputs.capture_grid = nGrids // 2
    out_ref = fb_full_batched(gl_b, inputs, K_top=8)
    assert len(out_ref) == 5
    gcap_ref = out_ref[4]
    mesh = make_mesh(2, 4)
    out_sh = fb_full_sharded(gl_b, inputs, mesh, K_top=8)
    assert len(out_sh) == 5
    gcap_sh = out_sh[4]
    assert gcap_sh.shape == gcap_ref.shape
    np.testing.assert_allclose(gcap_sh, gcap_ref, atol=3e-3)
    # captured gammas are normalized distributions over the panel
    np.testing.assert_allclose(gcap_sh.sum(axis=1), 1.0, atol=1e-3)
