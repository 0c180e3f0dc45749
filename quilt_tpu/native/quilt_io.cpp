// quilt_io: native host data plane for quilt_tpu.
//
// TPU-native equivalent of the reference's native IO layer (STITCH's
// C++/htslib loadBamAndConvert and vcfpp-based Rcpp_get_hap_info_from_vcf;
// see SURVEY.md section 2.9): BGZF decompression, reference-panel VCF
// ingestion straight to bit-packed haplotype words, and BAM read extraction
// to (SNP index, signed base quality) arrays with mate merging.
//
// Exposed as a C ABI consumed through ctypes (quilt_tpu/io/native.py);
// no htslib/pybind11 dependency — zlib only.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BGZF / gzip decompression
// ---------------------------------------------------------------------------

struct QioBuffer {
    std::vector<uint8_t> data;
};

// Decompress a BGZF or plain-gzip file fully into memory.
// Returns opaque handle (nullptr on failure).
void* qio_read_gzip(const char* path) {
    FILE* fh = fopen(path, "rb");
    if (!fh) return nullptr;
    std::vector<uint8_t> comp;
    {
        fseek(fh, 0, SEEK_END);
        long sz = ftell(fh);
        fseek(fh, 0, SEEK_SET);
        comp.resize(sz);
        if (sz > 0 && fread(comp.data(), 1, sz, fh) != (size_t)sz) {
            fclose(fh);
            return nullptr;
        }
    }
    fclose(fh);
    auto* out = new QioBuffer();
    if (comp.size() >= 2 && comp[0] == 0x1f && comp[1] == 0x8b) {
        // gzip members (BGZF = concatenated members); inflate all
        z_stream zs;
        memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, 15 + 32) != Z_OK) { delete out; return nullptr; }
        size_t in_off = 0;
        std::vector<uint8_t> chunk(1 << 20);
        while (in_off < comp.size()) {
            zs.next_in = comp.data() + in_off;
            zs.avail_in = comp.size() - in_off;
            int ret = Z_OK;
            while (ret != Z_STREAM_END) {
                zs.next_out = chunk.data();
                zs.avail_out = chunk.size();
                ret = inflate(&zs, Z_NO_FLUSH);
                if (ret != Z_OK && ret != Z_STREAM_END) {
                    inflateEnd(&zs);
                    delete out;
                    return nullptr;
                }
                out->data.insert(out->data.end(), chunk.data(),
                                 chunk.data() + (chunk.size() - zs.avail_out));
                if (ret == Z_OK && zs.avail_in == 0 && zs.avail_out != 0) break;
            }
            in_off = comp.size() - zs.avail_in;
            if (ret == Z_STREAM_END) {
                if (inflateReset2(&zs, 15 + 32) != Z_OK) break;
                if (zs.avail_in == 0) break;
            }
        }
        inflateEnd(&zs);
    } else {
        out->data = std::move(comp);
    }
    return out;
}

int64_t qio_buffer_size(void* h) {
    return ((QioBuffer*)h)->data.size();
}

const uint8_t* qio_buffer_data(void* h) {
    return ((QioBuffer*)h)->data.data();
}

void qio_buffer_free(void* h) {
    delete (QioBuffer*)h;
}

// ---------------------------------------------------------------------------
// Reference-panel VCF ingestion -> packed haplotype words
// ---------------------------------------------------------------------------

struct QioPanel {
    std::vector<int64_t> pos;
    std::vector<char> ref;
    std::vector<char> alt;
    std::vector<std::string> samples;
    // haplotype alleles per record, bit-packed later: store per record a
    // byte vector of 0/1 alleles (2 per sample)
    std::vector<std::vector<uint8_t>> alleles;
    int n_haps = 0;
    int n_skipped = 0;
};

static bool parse_gt_fields(const char* s, const char* end,
                            std::vector<uint8_t>& out) {
    out.clear();
    const char* p = s;
    while (p < end) {
        // one genotype field; first subfield before ':' is GT
        char a1 = *p;
        if (p + 2 >= end) return false;
        char sep = p[1];
        char a2 = p[2];
        if ((sep == '|' || sep == '/') &&
            (a1 == '0' || a1 == '1') && (a2 == '0' || a2 == '1')) {
            out.push_back(a1 - '0');
            out.push_back(a2 - '0');
            p += 3;
            // skip to next tab
            while (p < end && *p != '\t') p++;
            p++;
        } else {
            return false;
        }
    }
    return true;
}

void* qio_vcf_panel(const char* path, const char* chrom,
                    int64_t region_start, int64_t region_end) {
    void* bh = qio_read_gzip(path);
    if (!bh) return nullptr;
    QioBuffer* buf = (QioBuffer*)bh;
    auto* panel = new QioPanel();
    const char* p = (const char*)buf->data.data();
    const char* end = p + buf->data.size();
    int64_t last_pos = -1;
    std::string want_chrom = chrom ? chrom : "";
    while (p < end) {
        const char* nl = (const char*)memchr(p, '\n', end - p);
        if (!nl) nl = end;
        if (p[0] == '#') {
            if (p[1] != '#') {
                // header line: collect sample names (cols 10+)
                int col = 0;
                const char* q = p;
                while (q < nl) {
                    const char* t = (const char*)memchr(q, '\t', nl - q);
                    if (!t || t > nl) t = nl;
                    if (col >= 9)
                        panel->samples.emplace_back(q, t - q);
                    q = t + 1;
                    col++;
                }
            }
            p = nl + 1;
            continue;
        }
        // data line: CHROM POS ID REF ALT QUAL FILTER INFO FORMAT GTs...
        const char* f[9];
        const char* q = p;
        bool ok = true;
        for (int i = 0; i < 9; i++) {
            f[i] = q;
            const char* t = (const char*)memchr(q, '\t', nl - q);
            if (!t || t >= nl) { ok = (i == 8); q = nl + 1; break; }
            q = t + 1;
        }
        if (!ok) { p = nl + 1; continue; }
        // chrom filter
        size_t clen = strchr(f[0], '\t') - f[0];
        if (!want_chrom.empty() &&
            (clen != want_chrom.size() ||
             strncmp(f[0], want_chrom.c_str(), clen) != 0)) {
            p = nl + 1;
            continue;
        }
        int64_t pos = strtoll(f[1], nullptr, 10);
        if ((region_start >= 0 && pos < region_start) ||
            (region_end >= 0 && pos > region_end)) {
            p = nl + 1;
            continue;
        }
        char ref = f[3][0];
        char alt = f[4][0];
        bool bi = (f[3][1] == '\t') && (f[4][1] == '\t') &&
                  strchr("ACGT", ref) && strchr("ACGT", alt);
        if (!bi || pos == last_pos) {
            panel->n_skipped++;
            p = nl + 1;
            continue;
        }
        std::vector<uint8_t> alle;
        if (!parse_gt_fields(q, nl, alle)) {
            panel->n_skipped++;
            p = nl + 1;
            continue;
        }
        if (panel->n_haps == 0) panel->n_haps = alle.size();
        if ((int)alle.size() != panel->n_haps) {
            panel->n_skipped++;
            p = nl + 1;
            continue;
        }
        last_pos = pos;
        panel->pos.push_back(pos);
        panel->ref.push_back(ref);
        panel->alt.push_back(alt);
        panel->alleles.push_back(std::move(alle));
        p = nl + 1;
    }
    qio_buffer_free(bh);
    return panel;
}

int qio_panel_n_snps(void* h) { return ((QioPanel*)h)->pos.size(); }
int qio_panel_n_haps(void* h) { return ((QioPanel*)h)->n_haps; }
int qio_panel_n_skipped(void* h) { return ((QioPanel*)h)->n_skipped; }
int qio_panel_n_samples(void* h) { return ((QioPanel*)h)->samples.size(); }

void qio_panel_fill(void* h, int64_t* pos, char* ref, char* alt,
                    uint32_t* rhb_t /* [K, nGrids] row-major */) {
    QioPanel* panel = (QioPanel*)h;
    int n_snps = panel->pos.size();
    int K = panel->n_haps;
    int n_grids = (n_snps + 31) / 32;
    for (int s = 0; s < n_snps; s++) {
        pos[s] = panel->pos[s];
        ref[s] = panel->ref[s];
        alt[s] = panel->alt[s];
    }
    memset(rhb_t, 0, (size_t)K * n_grids * sizeof(uint32_t));
    for (int s = 0; s < n_snps; s++) {
        int g = s >> 5;
        int b = s & 31;
        const uint8_t* alle = panel->alleles[s].data();
        for (int k = 0; k < K; k++) {
            if (alle[k])
                rhb_t[(size_t)k * n_grids + g] |= (1u << b);
        }
    }
}

void qio_panel_sample_name(void* h, int i, char* out, int cap) {
    QioPanel* panel = (QioPanel*)h;
    snprintf(out, cap, "%s", panel->samples[i].c_str());
}

void qio_panel_free(void* h) { delete (QioPanel*)h; }

// ---------------------------------------------------------------------------
// BAM read extraction -> (snp index, signed bq) with mate merging
// ---------------------------------------------------------------------------

struct QioReads {
    std::vector<int32_t> u;        // flat SNP indices
    std::vector<int16_t> bq;       // flat signed quals
    std::vector<int64_t> offsets;  // per read, length n_reads+1
    int n_records = 0;
};

static const char SEQ_DECODE[17] = "=ACMGRSVTWYHKDBN";

void* qio_bam_extract(const char* path, const char* chrom,
                      const int64_t* snp_pos, const uint8_t* ref_code,
                      const uint8_t* alt_code, int n_snps,
                      int bq_filter, int isize_limit) {
    void* bh = qio_read_gzip(path);
    if (!bh) return nullptr;
    QioBuffer* buf = (QioBuffer*)bh;
    const uint8_t* p = buf->data.data();
    const uint8_t* end = p + buf->data.size();
    if (end - p < 12 || memcmp(p, "BAM\x01", 4) != 0) {
        qio_buffer_free(bh);
        return nullptr;
    }
    int32_t l_text;
    memcpy(&l_text, p + 4, 4);
    const uint8_t* q = p + 8 + l_text;
    int32_t n_ref;
    memcpy(&n_ref, q, 4);
    q += 4;
    int target_tid = -1;
    for (int i = 0; i < n_ref; i++) {
        int32_t l_name;
        memcpy(&l_name, q, 4);
        q += 4;
        if (strncmp((const char*)q, chrom, l_name - 1) == 0 &&
            (int)strlen(chrom) == l_name - 1)
            target_tid = i;
        q += l_name + 4;
    }
    auto* reads = new QioReads();
    // mate merging: map qname hash -> index into per-read accumulators
    std::unordered_map<std::string, size_t> group;
    std::vector<std::vector<std::pair<int32_t, int16_t>>> acc;
    const uint32_t BAD_FLAGS = 0x4 | 0x100 | 0x200 | 0x400 | 0x800;
    while (q + 4 <= end) {
        int32_t block_size;
        memcpy(&block_size, q, 4);
        q += 4;
        if (q + block_size > end || block_size < 32) break;
        const uint8_t* rec = q;
        q += block_size;
        reads->n_records++;
        int32_t refID, pos0;
        memcpy(&refID, rec, 4);
        memcpy(&pos0, rec + 4, 4);
        uint8_t l_read_name = rec[8];
        uint8_t mapq = rec[9];
        uint16_t n_cigar;
        memcpy(&n_cigar, rec + 12, 2);
        uint16_t flag;
        memcpy(&flag, rec + 14, 2);
        int32_t l_seq, tlen;
        memcpy(&l_seq, rec + 16, 4);
        memcpy(&tlen, rec + 28, 4);
        if (refID != target_tid || (flag & BAD_FLAGS)) continue;
        if (isize_limit > 0 && tlen != 0 &&
            (tlen > isize_limit || -tlen > isize_limit))
            continue;
        const char* qname = (const char*)rec + 32;
        const uint32_t* cigar = (const uint32_t*)(rec + 32 + l_read_name);
        const uint8_t* seq = rec + 32 + l_read_name + 4 * n_cigar;
        const uint8_t* qual = seq + (l_seq + 1) / 2;
        int64_t rpos = pos0;
        int qpos = 0;
        std::vector<std::pair<int32_t, int16_t>> bases;
        for (int ci = 0; ci < n_cigar; ci++) {
            uint32_t c = cigar[ci];
            int op = c & 0xF;
            int ln = c >> 4;
            // MIDNSHP=X -> 0..8
            if (op == 0 || op == 7 || op == 8) {  // M, =, X
                // binary search SNPs in [rpos+1, rpos+ln] (1-based)
                const int64_t* lo = std::lower_bound(
                    snp_pos, snp_pos + n_snps, rpos + 1);
                const int64_t* hi = std::upper_bound(
                    snp_pos, snp_pos + n_snps, rpos + ln);
                for (const int64_t* sp = lo; sp < hi; sp++) {
                    int si = sp - snp_pos;
                    int off = (int)(*sp - 1 - rpos);
                    int qi = qpos + off;
                    uint8_t nib = seq[qi >> 1];
                    uint8_t base = (qi & 1) ? (nib & 0xF) : (nib >> 4);
                    int bqv = qual[qi] < mapq ? qual[qi] : mapq;
                    if (bqv < bq_filter) continue;
                    if (base == alt_code[si])
                        bases.emplace_back(si, (int16_t)bqv);
                    else if (base == ref_code[si])
                        bases.emplace_back(si, (int16_t)(-bqv));
                }
                rpos += ln;
                qpos += ln;
            } else if (op == 2 || op == 3) {      // D, N
                rpos += ln;
            } else if (op == 1 || op == 4) {      // I, S
                qpos += ln;
            }
        }
        if (bases.empty()) continue;
        std::string key(qname);
        auto it = group.find(key);
        if (it == group.end()) {
            group.emplace(key, acc.size());
            acc.push_back(std::move(bases));
        } else {
            auto& v = acc[it->second];
            v.insert(v.end(), bases.begin(), bases.end());
        }
    }
    qio_buffer_free(bh);
    reads->offsets.push_back(0);
    for (auto& v : acc) {
        std::sort(v.begin(), v.end());
        // dedupe same SNP keeping max |bq|
        std::vector<std::pair<int32_t, int16_t>> ded;
        for (auto& pr : v) {
            if (!ded.empty() && ded.back().first == pr.first) {
                if (std::abs(pr.second) > std::abs(ded.back().second))
                    ded.back() = pr;
            } else {
                ded.push_back(pr);
            }
        }
        for (auto& pr : ded) {
            reads->u.push_back(pr.first);
            reads->bq.push_back(pr.second);
        }
        reads->offsets.push_back(reads->u.size());
    }
    return reads;
}

int qio_reads_n(void* h) { return ((QioReads*)h)->offsets.size() - 1; }
int64_t qio_reads_n_bases(void* h) { return ((QioReads*)h)->u.size(); }
int qio_reads_n_records(void* h) { return ((QioReads*)h)->n_records; }

void qio_reads_fill(void* h, int32_t* u, int16_t* bq, int64_t* offsets) {
    QioReads* r = (QioReads*)h;
    memcpy(u, r->u.data(), r->u.size() * sizeof(int32_t));
    memcpy(bq, r->bq.data(), r->bq.size() * sizeof(int16_t));
    memcpy(offsets, r->offsets.data(), r->offsets.size() * sizeof(int64_t));
}

void qio_reads_free(void* h) { delete (QioReads*)h; }

// ---------------------------------------------------------------------------
// msPBWT index build (the hot one-time loop of panel/mspbwt.py:
// build_mspbwt_indices; reference: mspbwt Rcpp_ms_BuildIndices_Algorithm5).
// Per column of the interleaved grid subset: gather symbols in the current
// PBWT order, record them (Y) + bucket offsets (C), advance the order with
// a stable counting sort, and checkpoint the positional prefix array A
// every egs columns. Blocked subset transpose keeps every inner loop in
// cache: the full build at K=100k x 10k grids runs in seconds vs ~100 s
// for the NumPy loop on this host.
// ---------------------------------------------------------------------------

void qio_mspbwt_build(
    const uint8_t* hm, int64_t K, int64_t nGrids,
    const int32_t* grids, int64_t T, int64_t egs,
    uint8_t* Y,            // out [T, K]
    int32_t* C,            // out [T, 257]
    int32_t* A_cp,         // out [n_cp, K], checkpoints at
    const int32_t* cp_cols, int64_t n_cp)
{
    (void)egs;
    // blocked gather of the grid subset, transposed: X[t][k] = hm[k][grids[t]]
    std::vector<uint8_t> X((size_t)T * K);
    const int64_t TB = 128;
    for (int64_t t0 = 0; t0 < T; t0 += TB) {
        int64_t t1 = std::min(t0 + TB, T);
        for (int64_t k = 0; k < K; ++k) {
            const uint8_t* row = hm + (size_t)k * nGrids;
            for (int64_t t = t0; t < t1; ++t)
                X[(size_t)t * K + k] = row[grids[t]];
        }
    }
    std::vector<int32_t> A(K), A2(K);
    for (int64_t k = 0; k < K; ++k) A[k] = (int32_t)k;
    int64_t cp_i = 0;
    int32_t pos[257];
    for (int64_t t = 0; t < T; ++t) {
        const uint8_t* col = &X[(size_t)t * K];
        uint8_t* y = Y + (size_t)t * K;
        int32_t* Ct = C + (size_t)t * 257;
        int32_t counts[256] = {0};
        for (int64_t k = 0; k < K; ++k) {
            uint8_t s = col[A[k]];
            y[k] = s;
            counts[s]++;
        }
        Ct[0] = 0;
        for (int s = 0; s < 256; ++s) Ct[s + 1] = Ct[s] + counts[s];
        for (int s = 0; s <= 256; ++s) pos[s] = Ct[s];
        for (int64_t k = 0; k < K; ++k) A2[pos[y[k]]++] = A[k];
        std::swap(A, A2);
        if (cp_i < n_cp && cp_cols[cp_i] == (int32_t)t) {
            memcpy(A_cp + (size_t)cp_i * K, A.data(), K * sizeof(int32_t));
            cp_i++;
        }
    }
}

}  // extern "C"

