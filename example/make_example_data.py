#!/usr/bin/env python
"""Fabricate a small self-contained imputation world for the example
workflow (the role of the reference's Zenodo example package,
example/run_example.sh + QUILT_usage.Md): a tabix-indexed reference-panel
VCF, a genetic map, and indexed low-coverage BAMs with known truth.

Usage: python example/make_example_data.py [outdir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from quilt_tpu.io import simulate_panel
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.io.bam_writer import BamWriter, write_panel_vcf


def main(outdir: str = "example/data", n_samples: int = 2,
         K: int = 100, nSNPs: int = 512, coverage: float = 1.5,
         seed: int = 11) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs, region_span=250_000)
    ref = np.array(["A"] * nSNPs)
    alt = np.array(["G"] * nSNPs)
    vcf = os.path.join(outdir, "panel.vcf.gz")
    write_panel_vcf(vcf, "chr20", pos, ref, alt, haps, index=True)
    # genetic map in the 3-column format QUILT consumes
    # (position, COMBINED_rate(cM/Mb), Genetic_Map(cM)) — the same layout
    # as the maps the reference ships in maps/ (e.g. CEU-chr20-final.b38)
    with open(os.path.join(outdir, "map.chr20.txt"), "w") as fh:
        fh.write("position COMBINED_rate.cM.Mb. Genetic_Map.cM.\n")
        fh.write(f"{pos[0]} 1.0 0.0\n")
        fh.write(f"{pos[-1]} 1.0 {(pos[-1] - pos[0]) / 1e6:.6f}\n")
    bams = []
    truth_rows = []
    for i in range(n_samples):
        truth = simulate_truth_mosaic(rng, haps, n_latent=2)
        truth_rows.append(truth.sum(axis=0))
        bam = os.path.join(outdir, f"NA{i:05d}.bam")
        with BamWriter(bam, "chr20", int(pos[-1]) + 1000,
                       sample_name=f"NA{i:05d}", index=True) as w:
            span = int(pos[-1] - pos[0])
            L = 300
            for r in range(int(coverage * span / L)):
                start0 = int(rng.integers(pos[0] - 100, pos[-1]))
                h = int(rng.integers(0, 2))
                seq = []
                for off in range(L):
                    gpos = start0 + 1 + off
                    si = int(np.searchsorted(pos, gpos))
                    if si < nSNPs and pos[si] == gpos:
                        a = truth[h, si]
                        if rng.random() < 0.003:
                            a = 1 - a
                        seq.append("G" if a else "A")
                    else:
                        seq.append("C")
                w.write_read(f"r{r}", start0, "".join(seq), [25] * L)
        bams.append(bam)
    with open(os.path.join(outdir, "bamlist.txt"), "w") as fh:
        fh.write("\n".join(bams) + "\n")
    np.savetxt(os.path.join(outdir, "truth_dosage.txt"),
               np.column_stack([pos] + truth_rows), fmt="%d",
               header="pos " + " ".join(f"NA{i:05d}"
                                        for i in range(n_samples)))
    print(f"Example data in {outdir}: region chr20:{pos[0]}-{pos[-1]}")
    print(f"REGION_START={pos[0]}")
    print(f"REGION_END={pos[-1]}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["example/data"]))
