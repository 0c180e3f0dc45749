import numpy as np

from quilt_tpu.utils import pack_bits_32, unpack_bits_32
from quilt_tpu.panel import (
    assign_positions_to_grid,
    compress_panel,
    interpolate_genetic_map,
    prepare_panel,
    sigma_from_cm_grid,
)
from quilt_tpu.io import simulate_panel


def test_pack_unpack_roundtrip(rng):
    haps = (rng.random((13, 101)) < 0.3).astype(np.uint8)
    packed = pack_bits_32(haps)
    assert packed.shape == (13, 4)
    out = unpack_bits_32(packed, 101)
    np.testing.assert_array_equal(out, haps)


def test_grid_assignment():
    L = np.arange(100) * 50 + 1
    grid, L_grid, nGrids = assign_positions_to_grid(L)
    assert nGrids == 4
    assert (grid[:32] == 0).all() and (grid[96:] == 3).all()
    assert len(L_grid) == 4


def test_genetic_map_interpolation():
    gmap_pos = np.array([100, 200, 300])
    gmap_cm = np.array([0.0, 1.0, 1.5])
    L = np.array([50, 100, 150, 250, 400])
    cm = interpolate_genetic_map(gmap_pos, gmap_cm, L, expRate=1.0)
    assert cm[1] == 0.0
    assert abs(cm[2] - 0.5) < 1e-12
    assert abs(cm[3] - 1.25) < 1e-12
    # extrapolation at 1 cM/Mb
    assert abs(cm[0] - (0.0 - 50 * 1.0 / 1e6)) < 1e-12
    assert abs(cm[4] - (1.5 + 100 * 1.0 / 1e6)) < 1e-12


def test_sigma_monotone():
    L_grid = np.array([0, 1000, 11000])
    cM_grid = np.array([0.0, 0.001, 0.2])
    sigma = sigma_from_cm_grid(100, cM_grid, L_grid, 1.0, 0.1, 100.0)
    assert sigma.shape == (2,)
    assert (sigma > 0).all() and (sigma < 1).all()
    assert sigma[0] > sigma[1]  # smaller recomb distance => higher stay prob


def test_compress_panel_exact(rng):
    haps, pos = simulate_panel(rng, K=60, nSNPs=200)
    rhb_t = pack_bits_32(haps)
    panel = compress_panel(rhb_t, 200, ref_error=0.001, nMaxDH=8)
    # Every hap/grid is represented: either via hapMatcher or an escape entry
    for g in range(panel.nGrids):
        dh = panel.hapMatcher[:, g].astype(int)
        words = rhb_t[:, g]
        matched = dh > 0
        np.testing.assert_array_equal(
            panel.distinctHapsB[dh[matched] - 1, g], words[matched]
        )
        esc = panel.esc_grid == g
        esc_k = panel.esc_k[esc]
        np.testing.assert_array_equal(np.flatnonzero(~matched), np.sort(esc_k))
        np.testing.assert_array_equal(
            panel.esc_word[esc], words[esc_k]
        )


def test_prepared_reference_roundtrip(tmp_path, rng):
    haps, pos = simulate_panel(rng, K=40, nSNPs=150)
    prep = prepare_panel(
        chrom="chr20",
        pos=pos,
        ref_allele=np.array(["A"] * 150),
        alt_allele=np.array(["G"] * 150),
        haps=haps,
        nMaxDH=16,
    )
    path = str(tmp_path / "prep.npz")
    prep.save(path)
    prep2 = prep.load(path)
    np.testing.assert_array_equal(prep2.rhb_t, prep.rhb_t)
    np.testing.assert_array_equal(prep2.panel.hapMatcher, prep.panel.hapMatcher)
    np.testing.assert_allclose(prep2.sigma, prep.sigma)
    assert prep2.chrom == "chr20"


def test_rare_common_split(rng):
    haps, pos = simulate_panel(rng, K=100, nSNPs=300)
    # force some SNPs rare
    haps[:, 5] = 0
    haps[1, 5] = 1
    prep = prepare_panel(
        chrom="1",
        pos=pos,
        ref_allele=np.array(["A"] * 300),
        alt_allele=np.array(["C"] * 300),
        haps=haps,
        impute_rare_common=True,
        rare_af_threshold=0.02,
    )
    assert prep.snp_is_common is not None
    assert not prep.snp_is_common[5]
    assert prep.nSNPs == prep.snp_is_common.sum()
    # hap 1 carries rare SNP 5
    assert 5 in prep.rare_per_hap_info[1]
    assert 5 not in prep.rare_per_hap_info[0]
