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
    py = read_panel_vcf(p)
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
        use_bx_tag=False,
    )
    u, bq, offsets = load_bam_reads_native(p, "chrX", pos, ref, alt)
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
