import numpy as np

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, compress_panel, trans_rates
from quilt_tpu.utils import pack_bits_32
from quilt_tpu.kernels import FBInputs, fb_full_batched
from quilt_tpu.oracle import haploid_dosage_versus_refs, make_gl_from_reads


def setup(rng, K=90, nSNPs=333, nMaxDH=8):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    panel = compress_panel(rhb_t, nSNPs, ref_error=0.001, nMaxDH=nMaxDH)
    sigma = rng.uniform(0.95, 0.999, nGrids - 1)
    trans = trans_rates(sigma)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=1500, phred=25
    )
    return haps, pos, grid, panel, trans, truth, reads, sim


def test_fb_kernel_matches_oracle(rng):
    haps, pos, grid, panel, trans, truth, reads, sim = setup(rng)
    assert len(panel.esc_k) > 0
    nSNPs = len(pos)
    gls = []
    oracle_res = []
    thinned = np.array([1, 4, 8])
    for h in (0, 1):
        which = np.flatnonzero(sim.labels == h)
        gl = make_gl_from_reads(reads, which, nSNPs)
        gls.append(gl)
        oracle_res.append(
            haploid_dosage_versus_refs(
                gl, panel, trans, thinned_grids=thinned, K_top_matches=5
            )
        )
    inputs = FBInputs.build(panel, trans, thinned_grids=thinned)
    gl_b = np.stack(gls).astype(np.float32)
    dosage, log_like, tv, ti = fb_full_batched(gl_b, inputs, K_top=8)
    for h in (0, 1):
        np.testing.assert_allclose(
            dosage[h], oracle_res[h].dosage, atol=2e-3
        ), f"hap {h} dosage mismatch"
        assert abs(log_like[h] - oracle_res[h].log_like) < np.abs(
            oracle_res[h].log_like
        ) * 1e-3 + 0.5
        # top matches: kernel's top-8 should contain oracle's top-5 values
        for i, g in enumerate(thinned):
            otm = oracle_res[h].top_matches[i][:5]
            otv = oracle_res[h].top_values[i][:5]
            kv = tv[g, h]
            kidx = ti[g, h]
            # best match should agree (up to ties in gamma)
            assert abs(kv[0] - otv[0]) < 1e-3
            assert set(otm[:3]).issubset(set(kidx.tolist()) | set(otm[:3][otv[:3] < kv[-1] + 1e-6]))


def test_fb_kernel_no_escapes(rng):
    haps, pos, grid, panel, trans, truth, reads, sim = setup(
        rng, K=50, nSNPs=222, nMaxDH=64
    )
    if len(panel.esc_k) > 0:
        # force no escapes by high nMaxDH
        panel = compress_panel(pack_bits_32(haps), len(pos), nMaxDH=255)
    assert len(panel.esc_k) == 0
    which = np.flatnonzero(sim.labels == 0)
    gl = make_gl_from_reads(reads, which, len(pos))
    res = haploid_dosage_versus_refs(gl, panel, trans)
    inputs = FBInputs.build(panel, trans)
    dosage, log_like, tv, ti = fb_full_batched(
        gl[None].astype(np.float32), inputs
    )
    np.testing.assert_allclose(dosage[0], res.dosage, atol=2e-3)
