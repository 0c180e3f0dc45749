"""Native prepare-path parity: threaded C++ panel compression and the
Algorithm-5-style occurrence-list msPBWT rank must match the NumPy paths
exactly (VERDICT r2 items: compress_panel scaling + O(K) query fix)."""
import numpy as np
import pytest

from quilt_tpu.io.native import native_available
from quilt_tpu.panel.mspbwt import MsIndex, build_mspbwt_indices, match_z
from quilt_tpu.panel.prepare import compress_panel


def _numpy_compress(rhb, nMaxDH):
    K, G = rhb.shape
    hm = np.zeros((K, G), dtype=np.uint8)
    db = np.zeros((nMaxDH, G), dtype=np.uint32)
    for g in range(G):
        words = rhb[:, g]
        uniq, inv, counts = np.unique(
            words, return_inverse=True, return_counts=True
        )
        order = np.argsort(-counts, kind="stable")
        nkeep = min(len(uniq), nMaxDH)
        kept = order[:nkeep]
        r = np.zeros(len(uniq), dtype=np.int32)
        r[kept] = np.arange(1, nkeep + 1)
        hm[:, g] = r[inv].astype(np.uint8)
        db[:nkeep, g] = uniq[kept]
    return hm, db


@pytest.mark.skipif(not native_available(), reason="no native lib")
def test_native_compress_matches_numpy(rng):
    from quilt_tpu.io.native import compress_panel_native
    K, G = 800, 70
    rhb = rng.integers(0, 60, size=(K, G), dtype=np.uint32)
    rhb[:, :30] = rng.integers(0, 1 << 32, size=(K, 30), dtype=np.uint32)
    hm_n, db_n = compress_panel_native(rhb, 9)
    hm_p, db_p = _numpy_compress(rhb, 9)
    np.testing.assert_array_equal(hm_n, hm_p)
    np.testing.assert_array_equal(db_n, db_p)


def test_occ_rank_matches_scan(rng):
    """match_z with occurrence lists == match_z with the O(K) scan."""
    K, G = 300, 64
    hm = rng.integers(0, 12, size=(K, G)).astype(np.uint8) + 1
    idxs = build_mspbwt_indices(hm, n_indices=2)
    assert idxs[0].occ is not None
    z = hm[17].copy()
    for idx in idxs:
        zi = z[idx.grids]
        X_rows = lambda cands, upto, idx=idx: hm[
            np.asarray(cands)[:, None], idx.grids[None, :upto]
        ]
        with_occ = sorted(match_z(idx, zi, X_rows, min_length=3, scan=4))
        no_occ = MsIndex(
            grids=idx.grids, Y=idx.Y, C=idx.C, cp_cols=idx.cp_cols,
            A_cp=idx.A_cp, egs=idx.egs, occ=None,
        )
        without = sorted(match_z(no_occ, zi, X_rows, min_length=3, scan=4))
        assert with_occ == without
        assert any(m[0] == 17 for m in with_occ)   # self-match found
