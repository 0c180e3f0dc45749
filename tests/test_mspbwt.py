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
    idx = build_mspbwt_indices(X, 1, egs=3)[0]
    # checkpointed A columns sort haps by reversed prefix X[:, :t+1]
    for ci, t in enumerate(idx.cp_cols):
        prefixes = [tuple(X[k, : t + 1][::-1]) for k in idx.A_cp[ci]]
        assert prefixes == sorted(prefixes)
    # Y[t] is X[:, t] under the column-t PBWT ordering: bucket offsets in
    # C must match the per-column symbol counts
    for t in range(12):
        counts = np.bincount(X[:, t], minlength=256)
        np.testing.assert_array_equal(np.diff(idx.C[t]), counts)


def _xrows(X):
    def f(cands, upto):
        return X[np.asarray(cands)[:, None], np.arange(upto)[None, :]]
    return f


def test_match_z_finds_exact_hap(rng):
    K, T = 40, 30
    X = rng.integers(0, 4, size=(K, T)).astype(np.uint8)
    idx = build_mspbwt_indices(X, 1, egs=4)[0]
    z = X[7].copy()
    matches = match_z(idx, z, _xrows(X), min_length=5)
    full = [m for m in matches if m[0] == 7]
    assert full, "query equal to hap 7 must match it"
    assert max(L for _, _, L in full) == T


def test_match_z_mosaic(rng):
    K, T = 50, 40
    X = rng.integers(0, 6, size=(K, T)).astype(np.uint8)
    z = np.concatenate([X[3, :20], X[11, 20:]])
    idx = build_mspbwt_indices(X, 1, egs=4)[0]
    matches = match_z(idx, z, _xrows(X), min_length=8)
    haps = {m[0] for m in matches}
    assert 3 in haps and 11 in haps
    # approach B (every-column up/down scan) finds them too
    matches_b = match_z(idx, z, _xrows(X), min_length=8, every_column=True)
    haps_b = {m[0] for m in matches_b}
    assert 3 in haps_b and 11 in haps_b


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


def test_native_build_matches_numpy(rng):
    """The C++ index build (quilt_io.cpp:qio_mspbwt_build) and the NumPy
    fallback produce identical structures."""
    from quilt_tpu.io.native import mspbwt_build_native, native_available

    if not native_available():
        pytest.skip("no native lib")
    K, nGrids = 300, 64
    hm = rng.integers(0, 30, size=(K, nGrids)).astype(np.uint8)
    for i, n_idx in [(0, 2), (1, 2)]:
        grids = np.arange(i, nGrids, n_idx, dtype=np.int32)
        egs = 5
        Yn, Cn, cpn, An, occn = mspbwt_build_native(hm, grids, egs)
        # numpy reference
        X = np.asfortranarray(hm[:, grids])
        T = len(grids)
        A = np.arange(K, dtype=np.int32)
        Y = np.empty((T, K), dtype=np.uint8)
        C = np.zeros((T, 257), dtype=np.int32)
        cps, Acp = [], []
        for t in range(T):
            y = X[A, t]
            Y[t] = y
            C[t, 1:] = np.cumsum(np.bincount(y, minlength=256))
            A = A[np.argsort(y, kind="stable")]
            if (t + 1) % egs == 0 or t == T - 1:
                cps.append(t)
                Acp.append(A.copy())
        np.testing.assert_array_equal(Yn, Y)
        np.testing.assert_array_equal(Cn, C)
        np.testing.assert_array_equal(cpn, np.asarray(cps))
        np.testing.assert_array_equal(An, np.stack(Acp))


def test_rank_modes_agree(rng):
    """occ, bit-plane, and scan rank structures give identical matches
    (the planes mode is the UKB-scale replacement for the r3
    withhold-past-2GB occ gate)."""
    from quilt_tpu.panel.mspbwt import (
        MsIndex, _rank_planes, build_mspbwt_indices, match_z,
    )

    K, nGrids = 150, 96
    hm = rng.integers(0, 7, (K, nGrids)).astype(np.uint8)
    qhaps = rng.integers(0, K, 3)          # fixed queries across modes

    outs = {}
    for mode in ("occ", "planes", "scan"):
        idxs = build_mspbwt_indices(hm, n_indices=3, egs=8, rank_mode=mode)
        for i, idx in enumerate(idxs):
            assert (idx.occ is not None) == (mode == "occ")
            assert (idx.planes is not None) == (mode == "planes")
            z = hm[qhaps[i], idx.grids].copy()
            z[2] = (z[2] + 1) % 7          # perturb
            sub = hm[:, idx.grids]
            rows = lambda cands, upto, sub=sub: sub[cands, :upto]
            m = sorted(match_z(idx, z, rows, min_length=3))
            outs.setdefault(i, {})[mode] = m
    for i, d in outs.items():
        assert d["occ"] == d["planes"] == d["scan"], f"index {i}"
        assert d["occ"], f"index {i}: no matches found"

    # direct rank equality on random queries
    idx = build_mspbwt_indices(hm, n_indices=1, egs=8, rank_mode="planes")[0]
    for _ in range(200):
        t = int(rng.integers(0, idx.Y.shape[0]))
        s = int(rng.integers(0, 8))
        p = int(rng.integers(0, K + 1))
        want = int(np.count_nonzero(idx.Y[t, :p] == s))
        assert _rank_planes(idx.planes[t], s, p) == want


def test_match_z_batch_equals_per_query(rng):
    """match_z_batch (vectorized insertion scan over queries) returns the
    same matches as per-query match_z."""
    from quilt_tpu.panel.mspbwt import build_mspbwt_indices, match_z, \
        match_z_batch

    K, nGrids = 120, 64
    hm = rng.integers(0, 256, (K, nGrids)).astype(np.uint8)
    hm[:40] = hm[0]              # shared rows so long matches exist
    assert (hm == 255).any()     # symbol 255 must be covered (uint8 wrap)
    idx = build_mspbwt_indices(hm, n_indices=1, egs=8)[0]
    Q = 9
    Z = np.stack([
        hm[rng.integers(0, K), idx.grids] for _ in range(Q)
    ])
    sub = hm[:, idx.grids]
    rows = lambda cands, upto: sub[cands, :upto]
    batch = match_z_batch(idx, Z, rows, min_length=3)
    for q in range(Q):
        want = sorted(match_z(idx, Z[q], rows, min_length=3))
        assert sorted(batch[q]) == want, q


def test_match_z_batch_planes_mode(rng):
    """match_z_batch with the UKB-scale rank structure (planes +
    subsampled occ) equals the occ-mode results."""
    from quilt_tpu.panel.mspbwt import build_mspbwt_indices, match_z_batch

    K, nGrids = 140, 64
    hm = rng.integers(0, 256, (K, nGrids)).astype(np.uint8)
    hm[:50] = hm[0]
    Z = np.stack([hm[int(rng.integers(0, K))]] * 4)
    outs = {}
    for mode in ("occ", "planes"):
        idx = build_mspbwt_indices(
            hm, n_indices=1, egs=8, rank_mode=mode
        )[0]
        Zi = np.ascontiguousarray(Z[:, idx.grids])
        sub = hm[:, idx.grids]
        rows = lambda cands, upto, sub=sub: sub[cands, :upto]
        outs[mode] = [
            sorted(x) for x in match_z_batch(idx, Zi, rows, min_length=3)
        ]
    assert outs["occ"] == outs["planes"]
    assert any(outs["occ"])


def test_symbols_device_equals_host(rng):
    """Device symbol extraction == host symbols_from_hap_dosage."""
    import jax.numpy as jnp
    from quilt_tpu.panel.mspbwt import (
        symbols_device, symbols_from_hap_dosage,
    )
    from quilt_tpu.utils import unpack_bits_32

    D, G = 64, 20
    nSNPs = G * 32 - 9
    dhB = rng.integers(0, 2**32, (D, G), dtype=np.uint32)
    dh_bits = unpack_bits_32(dhB, G * 32)
    hd = rng.random((3, 2, nSNPs))
    zd = np.asarray(symbols_device(jnp.asarray(hd), jnp.asarray(dh_bits),
                                   nSNPs))
    for r in range(3):
        for h in range(2):
            zh = symbols_from_hap_dosage(hd[r, h], dhB, nSNPs)
            np.testing.assert_array_equal(zd[r, h], zh)


def test_select_batch_equals_per_row(rng):
    """select_new_haps_mspbwt_batch == per-row select_new_haps_mspbwt
    given the same retained sets (no random fill triggered)."""
    from quilt_tpu.io import simulate_panel
    from quilt_tpu.panel.prepare import compress_panel
    from quilt_tpu.panel.mspbwt import (
        build_mspbwt_indices, select_new_haps_mspbwt,
        select_new_haps_mspbwt_batch, symbols_from_hap_dosage,
    )
    from quilt_tpu.utils import pack_bits_32, unpack_bits_32

    K, nSNPs = 80, 640
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    haps[40:] = haps[:40]        # duplicated panel -> plentiful matches
    rhb = pack_bits_32(haps)
    panel = compress_panel(rhb, nSNPs, nMaxDH=32)
    ms = build_mspbwt_indices(panel.hapMatcher, n_indices=2)
    n_rows, nl, Knew = 3, 2, 4
    hd = np.stack([
        np.stack([haps[int(rng.integers(0, K))].astype(float)
                  for _ in range(nl)])
        for _ in range(n_rows)
    ])
    symbols = np.stack([
        np.stack([
            symbols_from_hap_dosage(hd[r, h], panel.distinctHapsB, nSNPs)
            for h in range(nl)
        ]) for r in range(n_rows)
    ])
    prev_list = [np.array([0, 1], dtype=np.int64) for _ in range(n_rows)]
    batch = select_new_haps_mspbwt_batch(
        ms, panel, symbols, Knew, K, prev_list,
        np.random.default_rng(0),
    )
    for r in range(n_rows):
        single = select_new_haps_mspbwt(
            ms, panel, None, Knew, K, prev_list[r],
            np.random.default_rng(0), symbols=symbols[r],
        )
        np.testing.assert_array_equal(
            batch[r], single,
            err_msg=f"row {r} (random fill must not trigger: ranked "
                    f"matches should exceed Knew in this fixture)",
        )
