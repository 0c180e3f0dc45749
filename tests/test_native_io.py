"""Parity tests: native C++ IO engine vs the pure-Python implementations."""
import numpy as np
import pytest

from quilt_tpu.io import simulate_panel
from quilt_tpu.io.bam import load_bam_reads
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf
from quilt_tpu.io.native import (
    load_bam_reads_native,
    native_available,
    read_panel_vcf_native,
)
from quilt_tpu.io.vcf import read_panel_vcf
from quilt_tpu.panel import assign_positions_to_grid
from quilt_tpu.utils import unpack_bits_32

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def test_native_vcf_matches_python(tmp_path, rng):
    haps, pos = simulate_panel(rng, K=30, nSNPs=77)
    ref = np.array(list("ACGT" * 20))[:77]
    alt = np.array(list("TACG" * 20))[:77]
    p = str(tmp_path / "p.vcf.gz")
    write_panel_vcf(p, "chr2", pos, ref, alt, haps)
    py = read_panel_vcf(p, use_native=False)
    n_pos, n_ref, n_alt, rhb_t, names, n_skip = read_panel_vcf_native(p)
    np.testing.assert_array_equal(n_pos, py.pos)
    np.testing.assert_array_equal(n_ref, py.ref_allele)
    np.testing.assert_array_equal(
        unpack_bits_32(rhb_t, 77), py.haps
    )
    assert names == py.sample_names


def test_native_bam_matches_python(tmp_path, rng):
    nSNPs = 40
    pos = np.arange(500, 500 + nSNPs * 13, 13, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    hap = rng.integers(0, 2, nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    p = str(tmp_path / "s.bam")
    with BamWriter(p, "chrX", 5000) as w:
        for r in range(60):
            start0 = int(rng.integers(400, 900))
            L = 100
            seq = []
            for off in range(L):
                gpos = start0 + 1 + off
                si = np.searchsorted(pos, gpos)
                if si < nSNPs and pos[si] == gpos:
                    seq.append("G" if hap[si] else "A")
                else:
                    seq.append("C")
            w.write_read(f"r{r}", start0, "".join(seq), [28] * L)
        # mate pair sharing qname
        w.write_read("frag", 495, "A" * 30, [30] * 30)
        w.write_read("frag", 600, "G" * 30, [30] * 30)
    py = load_bam_reads(
        p, "chrX", pos, ref, alt, grid, downsampleToCov=10000,
        use_bx_tag=False, use_native=False,
    )
    u, bq, offsets, used_index = load_bam_reads_native(
        p, "chrX", pos, ref, alt, use_bx_tag=False
    )
    assert not used_index  # no .bai alongside and no region given
    assert len(offsets) - 1 == py.nReads
    # compare per-read (sorted) base sets
    py_sets = sorted(
        tuple(sorted(zip(py.read(r)[0].tolist(), py.read(r)[1].tolist())))
        for r in range(py.nReads)
    )
    na_sets = sorted(
        tuple(sorted(zip(
            u[offsets[r]:offsets[r + 1]].tolist(),
            bq[offsets[r]:offsets[r + 1]].tolist(),
        )))
        for r in range(len(offsets) - 1)
    )
    assert py_sets == na_sets


def test_native_bam_indexed_region_matches_full(tmp_path, rng):
    """With a .bai alongside and a region given, the native extractor seeks
    to overlapping BGZF chunks and must produce the same reads as a full
    scan (and as the pure-Python reader)."""
    nSNPs = 50
    pos = np.arange(1000, 1000 + nSNPs * 29, 29, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    hap = rng.integers(0, 2, nSNPs)
    p = str(tmp_path / "ix.bam")
    with BamWriter(p, "chrX", 10_000, index=True) as w:
        for r in range(120):
            start0 = int(rng.integers(800, 2400))
            L = 120
            seq = []
            for off in range(L):
                gpos = start0 + 1 + off
                si = np.searchsorted(pos, gpos)
                if si < nSNPs and pos[si] == gpos:
                    seq.append("G" if hap[si] else "A")
                else:
                    seq.append("C")
            w.write_read(f"r{r}", start0, "".join(seq), [28] * L)
    import os
    assert os.path.exists(p + ".bai")
    u0, bq0, off0, ix0 = load_bam_reads_native(
        p, "chrX", pos, ref, alt, use_bx_tag=False
    )
    u1, bq1, off1, ix1 = load_bam_reads_native(
        p, "chrX", pos, ref, alt, use_bx_tag=False,
        region_start=int(pos[0]), region_end=int(pos[-1]),
    )
    assert not ix0 and ix1
    def read_sets(u, bq, off):
        return sorted(
            tuple(sorted(zip(u[off[r]:off[r + 1]].tolist(),
                             bq[off[r]:off[r + 1]].tolist())))
            for r in range(len(off) - 1)
        )
    assert read_sets(u0, bq0, off0) == read_sets(u1, bq1, off1)
    assert len(u1) > 0


def test_native_bam_bx_and_softclip_parity(tmp_path, rng):
    """BX-tag linked-read merging (incl. the distance split) and soft-clip
    handling match the pure-Python reader exactly."""
    nSNPs = 30
    pos = np.arange(700, 700 + nSNPs * 17, 17, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    hap = rng.integers(0, 2, nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)

    def seq_for(start0, L):
        out = []
        for off in range(L):
            gpos = start0 + 1 + off
            si = np.searchsorted(pos, gpos)
            if si < nSNPs and pos[si] == gpos:
                out.append("G" if hap[si] else "A")
            else:
                out.append("C")
        return "".join(out)

    p = str(tmp_path / "bx.bam")
    with BamWriter(p, "chrX", 60_000) as w:
        # two fragments sharing a barcode, close together -> merged
        w.write_read("a1", 700, seq_for(700, 90), [30] * 90, bx="BX1")
        w.write_read("a2", 850, seq_for(850, 90), [30] * 90, bx="BX1")
        # same barcode, far away -> its own group (bxTagUpperLimit)
        w.write_read("a3", 40_000, seq_for(40_000, 90), [30] * 90, bx="BX1")
        # soft-clipped read: leading 10S aligns to [690, 700)
        L = 80
        w.write_read(
            "sc", 710, seq_for(700, L), [30] * L,
            cigar_ops=[("S", 10), ("M", L - 10)],
        )
        # plain mate pair
        w.write_read("m", 900, seq_for(900, 60), [30] * 60)
        w.write_read("m", 1000, seq_for(1000, 60), [30] * 60)
    for soft in (False, True):
        py = load_bam_reads(
            p, "chrX", pos, ref, alt, grid, downsampleToCov=0,
            use_bx_tag=True, bxTagUpperLimit=5000,
            useSoftClippedBases=soft, use_native=False,
        )
        na = load_bam_reads(
            p, "chrX", pos, ref, alt, grid, downsampleToCov=0,
            use_bx_tag=True, bxTagUpperLimit=5000,
            useSoftClippedBases=soft, use_native=True,
        )
        assert na.nReads == py.nReads
        np.testing.assert_array_equal(na.u, py.u)
        np.testing.assert_array_equal(na.bq, py.bq)
        np.testing.assert_array_equal(na.offsets, py.offsets)


def test_native_vcf_indexed_region(tmp_path, rng):
    """Tabix-indexed region query returns exactly the in-region records
    without streaming the whole file."""
    haps, pos = simulate_panel(rng, K=24, nSNPs=400)
    pos = np.sort(rng.choice(np.arange(10_000, 300_000), 400, replace=False))
    ref = np.array(["A"] * 400)
    alt = np.array(["C"] * 400)
    p = str(tmp_path / "ixp.vcf.gz")
    write_panel_vcf(p, "chr9", pos, ref, alt, haps, index=True)
    from quilt_tpu.io.native import read_panel_vcf_packed
    full = read_panel_vcf_packed(p, "chr9")
    assert not full["used_index"]
    lo, hi = int(pos[100]), int(pos[300])
    reg = read_panel_vcf_packed(p, "chr9", lo, hi)
    assert reg["used_index"]
    mask = (pos >= lo) & (pos <= hi)
    np.testing.assert_array_equal(reg["pos"], pos[mask])
    want = unpack_bits_32(full["rhb_t"], 400)[:, mask]
    np.testing.assert_array_equal(
        unpack_bits_32(reg["rhb_t"], int(mask.sum())), want
    )
    np.testing.assert_allclose(reg["af_all"], haps[:, mask].mean(axis=0))


def test_native_packed_split_matches_python(tmp_path, rng):
    """Streaming rare/common split (packed common words + rare-carrier CSR)
    matches the Python split on the inflated matrix."""
    K, nSNPs = 40, 256
    haps = (rng.random((K, nSNPs)) < 0.3).astype(np.uint8)
    # force some rare columns
    for j in range(0, nSNPs, 16):
        haps[:, j] = 0
        haps[rng.integers(0, K), j] = 1
    pos = np.arange(100, 100 + nSNPs * 7, 7, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["T"] * nSNPs)
    p = str(tmp_path / "split.vcf.gz")
    write_panel_vcf(p, "chr3", pos, ref, alt, haps)
    from quilt_tpu.io.native import read_panel_vcf_packed
    thr = 0.04
    res = read_panel_vcf_packed(p, "chr3", rare_af_threshold=thr)
    af = haps.mean(axis=0)
    maf = np.minimum(af, 1 - af)
    want_common = maf >= thr
    np.testing.assert_array_equal(res["snp_is_common"], want_common)
    np.testing.assert_allclose(res["af_all"], af)
    np.testing.assert_array_equal(
        unpack_bits_32(res["rhb_t"], int(want_common.sum())),
        haps[:, want_common],
    )
    rare_idx = np.flatnonzero(~want_common)
    off = res["rare_offsets"]
    for i, s in enumerate(rare_idx):
        np.testing.assert_array_equal(
            res["rare_flat"][off[i]:off[i + 1]],
            np.flatnonzero(haps[:, s]),
        )


def test_prepare_panel_presplit_equivalence(tmp_path, rng):
    """prepare_panel(presplit=...) (streaming, never-inflated path) builds
    the same PreparedReference as the inflated-haps path."""
    from quilt_tpu.io.native import read_panel_vcf_packed
    from quilt_tpu.panel.prepare import prepare_panel
    K, nSNPs = 36, 200
    haps = (rng.random((K, nSNPs)) < 0.35).astype(np.uint8)
    for j in range(0, nSNPs, 11):
        haps[:, j] = 0
        haps[rng.integers(0, K), j] = 1
    pos = np.arange(1000, 1000 + nSNPs * 9, 9, dtype=np.int64)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["T"] * nSNPs)
    p = str(tmp_path / "pp.vcf.gz")
    write_panel_vcf(p, "chr5", pos, ref, alt, haps)
    for rc in (False, True):
        packed = read_panel_vcf_packed(
            p, "chr5", rare_af_threshold=0.05 if rc else None
        )
        a = prepare_panel(
            "chr5", pos, ref, alt, haps=haps,
            impute_rare_common=rc, rare_af_threshold=0.05,
        )
        b = prepare_panel(
            "chr5", packed["pos"], packed["ref_allele"],
            packed["alt_allele"],
            impute_rare_common=rc, rare_af_threshold=0.05,
            presplit=packed,
        )
        np.testing.assert_array_equal(a.pos, b.pos)
        np.testing.assert_array_equal(a.rhb_t, b.rhb_t)
        np.testing.assert_allclose(a.af, b.af)
        np.testing.assert_array_equal(
            a.panel.hapMatcher, b.panel.hapMatcher
        )
        if rc:
            np.testing.assert_array_equal(a.snp_is_common, b.snp_is_common)
            np.testing.assert_allclose(a.af_all, b.af_all)
            assert len(a.rare_per_hap_info) == len(b.rare_per_hap_info)
            for x, y in zip(a.rare_per_hap_info, b.rare_per_hap_info):
                np.testing.assert_array_equal(x, y)
