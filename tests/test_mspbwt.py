import numpy as np
import pytest

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import compress_panel, prepare_panel
from quilt_tpu.panel.mspbwt import (
    build_mspbwt_indices,
    match_z,
    select_new_haps_mspbwt,
    symbols_from_hap_dosage,
)
from quilt_tpu.utils import pack_bits_32


def test_pbwt_prefix_arrays_sorted(rng):
    X = rng.integers(0, 5, size=(20, 12)).astype(np.uint8)
    idx = build_mspbwt_indices(X, 1)[0]
    # A[t] sorts haps by reversed prefix X[:, :t]
    for t in range(1, 13):
        prefixes = [tuple(X[k, :t][::-1]) for k in idx.A[t]]
        assert prefixes == sorted(prefixes)


def test_match_z_finds_exact_hap(rng):
    K, T = 40, 30
    X = rng.integers(0, 4, size=(K, T)).astype(np.uint8)
    idx = build_mspbwt_indices(X, 1)[0]
    z = X[7].copy()
    matches = match_z(idx, z, min_length=5)
    full = [m for m in matches if m[0] == 7]
    assert full, "query equal to hap 7 must match it"
    assert max(L for _, _, L in full) == T


def test_match_z_mosaic(rng):
    K, T = 50, 40
    X = rng.integers(0, 6, size=(K, T)).astype(np.uint8)
    z = np.concatenate([X[3, :20], X[11, 20:]])
    idx = build_mspbwt_indices(X, 1)[0]
    matches = match_z(idx, z, min_length=8)
    haps = {m[0] for m in matches}
    assert 3 in haps and 11 in haps


def test_symbols_roundtrip(rng):
    haps, pos = simulate_panel(rng, K=50, nSNPs=128)
    panel = compress_panel(pack_bits_32(haps), 128, nMaxDH=40)
    # a dosage equal to a panel hap should map to that hap's symbols
    k = 5
    z = symbols_from_hap_dosage(haps[k].astype(float), panel.distinctHapsB, 128)
    expected = panel.hapMatcher[k]
    w = expected > 0
    np.testing.assert_array_equal(z[w], expected[w])


def test_select_new_haps_finds_truth_copies(rng):
    haps, pos = simulate_panel(rng, K=80, nSNPs=256)
    panel = compress_panel(pack_bits_32(haps), 256, nMaxDH=64)
    idxs = build_mspbwt_indices(panel.hapMatcher, 2)
    hap_dos = haps[[12, 33]].astype(np.float64)
    chosen = select_new_haps_mspbwt(
        idxs, panel, hap_dos, Knew=20, K=80,
        previously_selected=np.array([], dtype=np.int64),
        rng=np.random.default_rng(0),
    )
    assert len(chosen) == 20
    assert len(set(chosen.tolist())) == 20
    # the true source haps (or identical twins) should rank in
    chosen_set = set(chosen.tolist())
    for k in (12, 33):
        twins = np.flatnonzero((haps == haps[k]).all(axis=1))
        assert chosen_set & set(twins.tolist()), f"hap {k} not selected"


def test_quilt2_end_to_end_mspbwt(rng, tmp_path):
    """QUILT2 path: mspbwt selection instead of full-panel FB."""
    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine import quilt_impute

    K, nSNPs = 100, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * nSNPs),
        alt_allele=np.array(["G"] * nSNPs),
        haps=haps, nMaxDH=64, use_mspbwt=True, mspbwt_nindices=2,
    )
    assert prep.ms_indices is not None
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, prep.grid, coverage=1.5, read_length_bp=600, phred=25
    )
    cfg = ImputeConfig(
        nGibbsSamples=3, n_seek_its=2, Ksubset=48, Knew=48,
        small_ref_panel_gibbs_iterations=8, use_mspbwt=True, seed=3,
    )
    truth_gen = truth.sum(axis=0)[:, None]
    out = quilt_impute(
        prep, [reads], ["S0"], cfg,
        output_filename=str(tmp_path / "q2.vcf.gz"),
        truth_gen=truth_gen,
    )
    assert out.results[0].imputed
    assert out.r2_per_sample[0] > 0.85, out.r2_per_sample
