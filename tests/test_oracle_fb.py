import numpy as np

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, compress_panel, trans_rates
from quilt_tpu.utils import pack_bits_32, unpack_bits_32
from quilt_tpu.oracle import (
    build_emat_dh,
    haploid_dosage_versus_refs,
    make_gl_from_reads,
)


def naive_fb_dosage(gl, haps, trans, ref_error):
    """Uncompressed reference FB: direct emissions per hap, for cross-check."""
    K, nSNPs = haps.shape
    nGrids = (nSNPs + 31) // 32
    e_h = np.where(haps == 1, 1 - ref_error, ref_error)
    # per-grid emission per hap
    em = np.ones((K, nGrids))
    for g in range(nGrids):
        s, e = 32 * g, min(32 * (g + 1), nSNPs)
        em[:, g] = np.prod(
            gl[0, s:e] * (1 - e_h[:, s:e]) + gl[1, s:e] * e_h[:, s:e], axis=1
        )
    alpha = np.zeros((K, nGrids))
    c = np.zeros(nGrids)
    alpha[:, 0] = em[:, 0] / K
    c[0] = 1 / alpha[:, 0].sum()
    alpha[:, 0] *= c[0]
    for g in range(1, nGrids):
        alpha[:, g] = em[:, g] * (
            trans[0, g - 1] * alpha[:, g - 1] + trans[1, g - 1] / K
        )
        c[g] = 1 / alpha[:, g].sum()
        alpha[:, g] *= c[g]
    beta = np.ones((K, nGrids))
    for g in range(nGrids - 2, -1, -1):
        etb = em[:, g + 1] * beta[:, g + 1] * c[g + 1]
        beta[:, g] = trans[0, g] * etb + trans[1, g] * etb.mean()
    dosage = np.zeros(nSNPs)
    for g in range(nGrids):
        gam = alpha[:, g] * beta[:, g]
        gam /= gam.sum()
        s, e = 32 * g, min(32 * (g + 1), nSNPs)
        dosage[s:e] = gam @ e_h[:, s:e]
    return dosage


def setup(rng, K=80, nSNPs=300, nMaxDH=8):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    panel = compress_panel(rhb_t, nSNPs, ref_error=0.001, nMaxDH=nMaxDH)
    sigma = np.full(nGrids - 1, 0.99)
    trans = trans_rates(sigma)
    return haps, pos, grid, panel, trans


def test_compressed_fb_equals_naive(rng):
    """Compression with escapes must be exact, not approximate."""
    haps, pos, grid, panel, trans = setup(rng, nMaxDH=6)
    assert len(panel.esc_k) > 0, "fixture should exercise escapes"
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=2000, phred=25
    )
    which = np.flatnonzero(sim.labels == 0)
    gl = make_gl_from_reads(reads, which, len(pos))
    res = haploid_dosage_versus_refs(gl, panel, trans, ref_error=0.001)
    expected = naive_fb_dosage(gl, haps, trans, 0.001)
    np.testing.assert_allclose(res.dosage, expected, rtol=1e-6, atol=1e-8)


def test_fb_recovers_truth_hap(rng):
    haps, pos, grid, panel, trans = setup(rng, K=100, nSNPs=400, nMaxDH=32)
    # truth hap IS panel hap 3: the FB should put dosage on its alleles
    truth = np.stack([haps[3], haps[10]])
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=4.0, read_length_bp=3000, phred=30
    )
    which = np.flatnonzero(sim.labels == 0)
    gl = make_gl_from_reads(reads, which, len(pos))
    res = haploid_dosage_versus_refs(gl, panel, trans)
    covered = np.zeros(len(pos), dtype=bool)
    covered[reads.u[np.isin(np.arange(len(reads.u)), np.concatenate([
        np.arange(reads.offsets[r], reads.offsets[r + 1]) for r in which
    ]))]] = True
    err = np.abs(res.dosage - haps[3])
    assert err[covered].mean() < 0.1
    r2 = np.corrcoef(res.dosage, haps[3])[0, 1] ** 2
    assert r2 > 0.8


def test_fb_top_matches(rng):
    haps, pos, grid, panel, trans = setup(rng, K=60, nSNPs=256, nMaxDH=16)
    truth = np.stack([haps[7], haps[8]])
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=6.0, read_length_bp=4000, phred=30
    )
    which = np.flatnonzero(sim.labels == 0)
    gl = make_gl_from_reads(reads, which, len(pos))
    thinned = np.array([0, 3, 7])
    res = haploid_dosage_versus_refs(
        gl, panel, trans, thinned_grids=thinned, K_top_matches=5
    )
    assert len(res.top_matches) == 3
    for tm, tv in zip(res.top_matches, res.top_values):
        assert len(tm) >= 5
        assert (np.diff(tv) <= 1e-15).all()  # sorted descending
    # hap 7 (or an identical hap) should appear among top matches somewhere
    found = any(
        (haps[tm] == haps[7]).all(axis=1).any() for tm in res.top_matches
    )
    assert found
