"""Native CRAM reader/writer (io/cram.py).

Mirrors the reference's CRAM acceptance coverage (test-acceptance-cram.R):
CRAM input must behave exactly like the same reads supplied as BAM. The
reference builds its CRAMs with samtools; here the module's own
spec-conformant writer provides the fixtures, and a hand-built
reference-based container exercises the feature/codec paths the writer does
not emit (substitutions, deletions, insertions, soft clips, HUFFMAN and
BETA core-block codecs, ap_delta).
"""
import struct

import numpy as np

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.io.bam import bam_sample_name, load_bam_reads
from quilt_tpu.io.bam_writer import BamWriter
from quilt_tpu.io.cram import (
    CompressionHeader, CramWriter, Encoding, METHOD_GZIP, METHOD_RAW,
    CT_COMPRESSION_HEADER, CT_CORE, CT_EXTERNAL, CT_SLICE_HEADER,
    _emit_block, _emit_compression_header, _emit_container, _eof_container,
    rans_encode0, rans_decode, read_cram, read_itf8, read_ltf8,
    write_itf8, write_ltf8,
)
from quilt_tpu.panel import assign_positions_to_grid


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 5000, 123456, 2**21, 2**28 - 1, 2**28,
              2**31 - 1, -1, -7]:
        enc = write_itf8(v)
        d, off = read_itf8(enc, 0)
        assert (d, off) == (v, len(enc)), v
    for v in [0, 127, 128, 300, 2**20, 2**40, 2**55, -1]:
        enc = write_ltf8(v)
        d, off = read_ltf8(enc, 0)
        assert (d, off) == (v, len(enc)), v


def test_rans_roundtrip(rng):
    cases = [
        b"A" * 100,
        bytes(rng.integers(0, 4, 1000, dtype=np.uint8) + 65),
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(range(256)) * 10,
        b"x",
    ]
    for data in cases:
        assert rans_decode(rans_encode0(data)) == data


def test_cram_writer_reader_roundtrip(rng, tmp_path):
    path = str(tmp_path / "t.cram")
    n = 150
    poss = np.sort(rng.integers(1, 90_000, n))
    seqs = ["".join("ACGT"[b] for b in rng.integers(0, 4, 60))
            for _ in range(n)]
    quals = [list(rng.integers(20, 40, 60)) for _ in range(n)]
    with CramWriter(path, "chr7", 100_000, sample="NA7") as w:
        for i in range(n):
            w.write_read(f"r{i}", int(poss[i]), seqs[i], quals[i], tlen=120)
    assert bam_sample_name(path) == "NA7"
    hdr, refs, recs = read_cram(path)
    assert refs == [("chr7", 100_000)]
    assert len(recs) == n
    by_name = {r.qname: r for r in recs}
    dec = "=ACMGRSVTWYHKDBN"
    for i in range(n):
        r = by_name[f"r{i}"]
        assert r.pos0 == poss[i] - 1
        got = "".join(
            dec[(r.seq_packed[j >> 1] >> 4) if j % 2 == 0
                else (r.seq_packed[j >> 1] & 0xF)]
            for j in range(r.l_seq)
        )
        assert got == seqs[i]
        assert list(r.qual) == quals[i]
        assert r.tlen == 120


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for k in range(nbits - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for j, b in enumerate(self.bits[i:i + 8]):
                byte |= b << (7 - j)
            out.append(byte)
        return bytes(out)


def test_cram_reference_based_decode(tmp_path, rng):
    """Hand-built reference-based slice: X/D/I/S features, HUFFMAN FC,
    BETA DL, BYTE_ARRAY_STOP insertions, ap_delta positions."""
    ref = "".join("ACGT"[b] for b in rng.integers(0, 4, 1000))
    fasta = tmp_path / "ref.fa"
    fasta.write_text(">c1 test\n" + ref + "\n")

    ids = dict(BF=1, CF=2, RL=3, AP=4, RG=5, RN=6, MF=7, NS=8, NP=9, TS=10,
               TL=11, FN=12, FP=13, BS=14, SC=15, IN=16, MQ=17, QS=18)
    ch = CompressionHeader(rn_preserved=True, ap_delta=True, rr=True)
    # SM: every row ranks its 4 alt bases in ACGTN order -> byte 0x1B
    ch.sub_matrix = bytes([0x1B] * 5)
    fc_enc = Encoding(3, symbols=[ord("S"), ord("X"), ord("D"), ord("I")],
                      lengths=[1, 2, 3, 3])
    for k, i in ids.items():
        ch.series[k] = Encoding(1, content_id=i)
    ch.series["RN"] = Encoding(5, stop_byte=0, content_id=ids["RN"])
    ch.series["FC"] = fc_enc
    ch.series["DL"] = Encoding(6, offset=0, nbits=4)
    ch.series["SC"] = Encoding(
        4, len_enc=Encoding(1, content_id=ids["SC"]),
        val_enc=Encoding(1, content_id=ids["SC"]),
    )
    ch.series["IN"] = Encoding(5, stop_byte=0xFF, content_id=ids["IN"])

    streams = {i: bytearray() for i in ids.values()}

    def put(key, v):
        streams[ids[key]] += write_itf8(v)

    core = _BitWriter()
    huff = {sym: (ln, code) for (ln, code), sym in fc_enc.huff_table().items()}

    # one record: RL=20, AP=101, features S(2) X D(3) I(2)
    put("BF", 0x1 | 0x40)
    put("CF", 0x1 | 0x2)
    put("RL", 20)
    put("AP", 0)                     # delta from slice start 101
    put("RG", 0)
    streams[ids["RN"]] += b"q1\x00"
    put("MF", 0)
    put("NS", 0)
    put("NP", 0)
    put("TS", 0)
    put("TL", 0)
    put("FN", 4)
    # S at fp 1, len 2 "TT"
    ln, code = huff[ord("S")]
    core.write(code, ln)
    put("FP", 1)
    streams[ids["SC"]] += write_itf8(2) + b"TT"
    # X at fp 5 (code 0 -> first alt of the ref base)
    ln, code = huff[ord("X")]
    core.write(code, ln)
    put("FP", 4)
    put("BS", 0)
    # D at fp 8, length 3 via BETA(4 bits)
    ln, code = huff[ord("D")]
    core.write(code, ln)
    put("FP", 3)
    core.write(3, 4)
    # I at fp 10, bases "GG"
    ln, code = huff[ord("I")]
    core.write(code, ln)
    put("FP", 2)
    streams[ids["IN"]] += b"GG\xff"
    put("MQ", 55)
    streams[ids["QS"]] += bytes([30] * 20)

    ch_blk = _emit_block(METHOD_GZIP, CT_COMPRESSION_HEADER, 0,
                         _emit_compression_header(ch))
    content_ids = sorted(streams)
    sh = (write_itf8(0) + write_itf8(101) + write_itf8(40) + write_itf8(1)
          + write_ltf8(0) + write_itf8(len(content_ids) + 1)
          + write_itf8(len(content_ids))
          + b"".join(write_itf8(i) for i in content_ids)
          + write_itf8(-1) + b"\x00" * 16)
    blocks = [ch_blk, _emit_block(METHOD_RAW, CT_SLICE_HEADER, 0, sh),
              _emit_block(METHOD_RAW, CT_CORE, 0, core.bytes())]
    for i in content_ids:
        blocks.append(_emit_block(METHOD_GZIP, CT_EXTERNAL, i,
                                  bytes(streams[i])))
    path = tmp_path / "ref.cram"
    header = "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:1000\n"
    txt = header.encode()
    with open(path, "wb") as fh:
        fh.write(b"CRAM\x03\x00" + b"t".ljust(20, b"\x00"))
        hb = _emit_block(METHOD_RAW, 0, 0,
                         struct.pack("<i", len(txt)) + txt)
        fh.write(_emit_container(0, 0, 0, 0, 0, 0, [hb]))
        fh.write(_emit_container(0, 101, 40, 1, 0, 20, blocks))
        fh.write(_eof_container())

    hdr, refs, recs = read_cram(str(path), fasta=str(fasta))
    assert refs == [("c1", 1000)]
    assert len(recs) == 1
    r = recs[0]
    assert r.pos0 == 100 and r.mapq == 55
    # expected reconstruction (1-based read coords; ref is 0-based from 100)
    exp = list("TT")                       # S at 1-2
    exp += list(ref[100:102])              # M at 3-4
    alts = [b for b in "ACGTN" if b != ref[102]]
    exp += [alts[0]]                       # X at 5 (code 0 -> first alt)
    exp += list(ref[103:105])              # M at 6-7
    # D consumes ref 105-107
    exp += list(ref[108:110])              # M at 8-9
    exp += list("GG")                      # I at 10-11
    exp += list(ref[110:119])              # M to RL
    dec = "=ACMGRSVTWYHKDBN"
    got = "".join(
        dec[(r.seq_packed[j >> 1] >> 4) if j % 2 == 0
            else (r.seq_packed[j >> 1] & 0xF)]
        for j in range(r.l_seq)
    )
    assert got == "".join(exp)
    # CIGAR: 2S 2M 1M(X) 2M 3D 2M 2I 9M -> 2S5M3D2M2I9M
    cig = [(c >> 4, "MIDNSHP=X"[c & 0xF]) for c in r.cigar]
    assert cig == [(2, "S"), (5, "M"), (3, "D"), (2, "M"), (2, "I"),
                   (9, "M")]


def test_cram_reads_match_bam(rng, tmp_path):
    """The same simulated reads supplied as CRAM and as BAM must produce
    identical SampleReads (mirror of test-acceptance-cram.R)."""
    K, nSNPs = 40, 512
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=2.0, read_length_bp=300, phred=28,
    )
    chrom_len = int(pos[-1]) + 1000
    bam = str(tmp_path / "s.bam")
    cram = str(tmp_path / "s.cram")
    L = 300
    starts = rng.integers(0, chrom_len - L - 1, 400)
    with BamWriter(bam, "chrX", chrom_len, sample_name="NA1") as wb, \
            CramWriter(cram, "chrX", chrom_len, sample="NA1") as wc:
        for i, s0 in enumerate(sorted(int(x) for x in starts)):
            lo = np.searchsorted(pos, s0 + 1)
            hi = np.searchsorted(pos, s0 + L, side="right")
            seq = ["ACGT"[b] for b in rng.integers(0, 4, L)]
            hap = int(rng.integers(0, 2))
            for si in range(lo, hi):
                seq[pos[si] - 1 - s0] = ("T" if truth[hap, si] else "C")
            quals = [28] * L
            wb.write_read(f"rd{i}", s0, "".join(seq), quals)
            wc.write_read(f"rd{i}", s0 + 1, "".join(seq), quals)
    ref_al = np.array(["C"] * nSNPs)
    alt_al = np.array(["T"] * nSNPs)
    kw = dict(chrom="chrX", snp_pos=pos, ref_allele=ref_al,
              alt_allele=alt_al, grid=grid, downsampleToCov=0)
    rb = load_bam_reads(bam, **kw)
    rc = load_bam_reads(cram, **kw)
    assert rb.nReads == rc.nReads and rb.nReads > 50
    np.testing.assert_array_equal(rb.u, rc.u)
    np.testing.assert_array_equal(rb.bq, rc.bq)
    np.testing.assert_array_equal(rb.wif0, rc.wif0)


def test_crai_region_query_matches_full(tmp_path, rng):
    """Indexed region reads == full-scan reads filtered (mirrors
    test_native_bam_indexed_region_matches_full for the CRAM path)."""
    path = str(tmp_path / "r.cram")
    with CramWriter(path, "chr20", 100_000, max_container_records=50) as w:
        for i in range(300):
            pos = 100 + i * 300
            w.write_read(f"r{i}", pos, "ACGT" * 25, [30] * 100)
    import os
    assert os.path.exists(path + ".crai")
    _h, refs, rec_all = read_cram(path)
    _h, refs, rec_q = read_cram(path, region=("chr20", 30_000, 60_000))
    assert 0 < len(rec_q) < len(rec_all)
    # candidates are container-level; every read in the window is present
    in_window = {r.qname for r in rec_all
                 if r.pos0 + 100 >= 30_000 and r.pos0 < 60_000}
    assert in_window <= {r.qname for r in rec_q}
    # and equality of decoded content for shared reads
    by_name = {r.qname: r for r in rec_all}
    for r in rec_q:
        assert by_name[r.qname].seq_packed == r.seq_packed
    # wrong chromosome -> nothing
    _h, _r, rec_none = read_cram(path, region=("chrX", 1, 1_000_000))
    assert rec_none == []


def test_cram_alt_contig_reads(tmp_path):
    """HLA alt-contig extraction from a CRAM with a .crai, incl. the
    mate filters of filter_that2 (hla_functions.R:614-669)."""
    from quilt_tpu.io.bam import load_hla_alt_contig_reads

    path = str(tmp_path / "h.cram")
    with CramWriter(path, "chr6", 1_000_000,
                    contigs=[("HLA-A*01:01:01:01", 3500),
                             ("chr7", 500_000)]) as w:
        # primary-region reads
        w.write_read("p0", 29_900_000 % 900_000, "ACGT" * 25, [30] * 100,
                     tid=0)
        # alt-contig read, mate on chr6 inside region -> kept
        w.write_read("alt_keep", 120, "ACGT" * 25, [30] * 100, tid=1,
                     mate_tid=0, mate_pos1=29_000)
        # alt-contig read, mate on another primary chromosome -> dropped
        w.write_read("alt_drop", 140, "ACGT" * 25, [30] * 100, tid=1,
                     mate_tid=2, mate_pos1=1000)
        # alt-contig read, no mate info -> kept
        w.write_read("alt_nomate", 160, "TTTT" * 25, [30] * 100, tid=1)
    out = load_hla_alt_contig_reads(path, "A", "chr6", 28_000, 31_000)
    names = {q for q, _s, _q in out}
    assert "alt_keep" in names and "alt_nomate" in names
    assert "alt_drop" not in names
    for q, seq, qual in out:
        assert len(seq) == 100 and len(qual) == 100
        if q == "alt_nomate":
            assert (seq == 3).all()          # T = code 3
