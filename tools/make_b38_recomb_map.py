"""Build a GRCh38 genetic map from 1000G build-37 recombination rates.

Python equivalent of the reference recipe (QUILT
scripts/make_b38_recomb_map.R, documented in maps/README.md): reformat the
b37 per-interval rates for UCSC liftOver, lift to hg38, drop intervals
whose size changed or that overlap after lifting, fill gaps with the
50 kb-averaged neighbouring rate, rebuild the cumulative map, and smooth
the rate column with the 2 kb-radius kernel (panel.make_smoothed_rate,
the STITCH rcpp_make_smoothed_rate equivalent).

Usage:
    python tools/make_b38_recomb_map.py <recomb_dir> <panel> <chr> \
        [--liftover PATH --chain PATH | --lifted FILE]

Inputs: <recomb_dir>/<panel>/<panel>-<chr>-final.txt.gz with columns
(position, rate cM/Mb, cumulative cM), e.g. the 1000G
CEU_omni_recombination_20130507 release. Without network access, download
the tarball and the hg19ToHg38 chain as described in maps/README.md.
Output: <recomb_dir>/<panel>/<panel>-<chr>-final.b38.txt.gz in QUILT's
genetic-map format (position COMBINED_rate.cM.Mb. Genetic_Map.cM.).
"""
from __future__ import annotations

import argparse
import gzip
import os
import subprocess
import sys

import numpy as np


def load_b37_rates(path: str):
    pos, rate = [], []
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        header = fh.readline()
        for line in fh:
            p = line.split()
            if len(p) >= 2:
                pos.append(int(float(p[0])))
                rate.append(float(p[1]))
    return np.asarray(pos), np.asarray(rate)


def intervals_for_liftover(chrom: str, pos: np.ndarray, rate: np.ndarray):
    """BED-like rows (chr, start, end, rate, 'X', '+'), one per b37
    inter-position interval (make_b38_recomb_map.R step 1)."""
    return [
        (f"chr{chrom}", int(pos[i]), int(pos[i + 1]), float(rate[i]))
        for i in range(len(pos) - 1)
    ]


def run_liftover(rows, liftover: str, chain: str, workdir: str):
    """Invoke UCSC liftOver; returns (lifted rows, unmapped input rows)."""
    src = os.path.join(workdir, "for_liftover.txt")
    dst = os.path.join(workdir, "lifted.txt")
    unm = os.path.join(workdir, "unmapped.txt")
    with open(src, "w") as fh:
        for c, s, e, r in rows:
            fh.write(f"{c} {s} {e} {r} X +\n")
    subprocess.run([liftover, src, chain, dst, unm], check=True)
    lifted = []
    with open(dst) as fh:
        for line in fh:
            p = line.split()
            lifted.append((p[0], int(p[1]), int(p[2]), float(p[3])))
    unmapped_starts = set()
    with open(unm) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            p = line.split()
            if len(p) >= 2:
                unmapped_starts.add(int(p[1]))
    kept_inputs = [r for r in rows if r[1] not in unmapped_starts]
    return lifted, kept_inputs


def read_lifted_file(path: str):
    out = []
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        for line in fh:
            p = line.split()
            if len(p) >= 4:
                out.append((p[0], int(p[1]), int(p[2]), float(p[3])))
    return out


def clean_lifted(chrom: str, lifted, originals):
    """Keep same-chromosome intervals whose size survived the lift, sort,
    and drop rows that overlap their predecessor (R script step 3)."""
    assert len(lifted) == len(originals), (
        "lifted rows must pair 1:1 with surviving input rows"
    )
    rows = [
        lf for lf, od in zip(lifted, originals)
        if lf[0] == f"chr{chrom}" and (lf[2] - lf[1]) == (od[2] - od[1])
    ]
    rows.sort(key=lambda r: r[1])
    out = []
    for r in rows:
        if out and r[1] < out[-1][2]:
            continue
        out.append(r)
    return out


def _avg_rate(rows, idx, direction, want=25_000):
    """Length-weighted mean rate over `want` bp before (direction=-1) or
    after (direction=+1) interval idx (the R script's 50 kb gap filler)."""
    j = idx + direction
    to_add = want
    rate_sum = 0.0
    while 0 <= j < len(rows) and to_add > 0:
        ln = rows[j][2] - rows[j][1]
        take = min(ln, to_add)
        rate_sum += take * rows[j][3]
        to_add -= take
        j += direction
    used = want - to_add
    return rate_sum / used if used > 0 else 1.0


def fill_gaps(chrom: str, rows):
    """Insert gap intervals rated at the mean of the 25 kb flanking
    averages (reset to 0.1 when undefined)."""
    out = list(rows)
    add = []
    for i in range(len(rows) - 1):
        if rows[i][2] < rows[i + 1][1]:
            before = _avg_rate(rows, i, -1)
            after = _avg_rate(rows, i + 1, +1)
            val = 0.5 * before + 0.5 * after
            if not np.isfinite(val):
                val = 0.1
            add.append((f"chr{chrom}", rows[i][2], rows[i + 1][1], val))
    out.extend(add)
    out.sort(key=lambda r: r[1])
    return out


def smooth_rates(rate: np.ndarray, pos: np.ndarray, radius: int = 2000):
    """Per-bp windowed average of the per-interval rates over +/- radius bp
    around each interval midpoint: the raw-rate semantics of
    rcpp_make_smoothed_rate (STITCH copied-from-stitch.cpp:446-518) as the
    map recipe uses it (make_b38_recomb_map.R 'new - smooth!' step) —
    unlike panel.make_smoothed_rate this neither transforms through sigma
    nor normalizes the maximum to 1."""
    n = len(pos)
    out = np.zeros(n - 1)
    for i in range(n - 1):
        focal = (pos[i] + pos[i + 1]) // 2
        acc = total = 0.0
        j, left, prev = i, radius, focal
        while left > 0 and j >= 0:
            take = min(prev - pos[j], left)
            acc += take * rate[j]
            total += take
            left -= take
            prev = pos[j]
            j -= 1
        j, left, prev = i + 1, radius, focal
        while left > 0 and j < n:
            take = min(pos[j] - prev, left)
            acc += take * rate[j - 1]
            total += take
            left -= take
            prev = pos[j]
            j += 1
        out[i] = acc / max(total, 1.0)
    return out


def build_map(rows, smooth: bool = True):
    """(position, rate cM/Mb, cumulative cM) arrays from clean contiguous
    intervals, rate column smoothed with the 2 kb kernel."""
    pos = np.array([r[1] for r in rows] + [rows[-1][2]], dtype=np.int64)
    rate = np.array([r[3] for r in rows] + [0.0])
    if smooth:
        sm = smooth_rates(rate, pos, radius=2000)
        rate = np.concatenate([sm, [0.0]])
    cm = np.concatenate([[0.0], np.cumsum(rate[:-1] * np.diff(pos) / 1e6)])
    return pos, rate, cm


def write_map(path: str, pos, rate, cm):
    with gzip.open(path, "wt") as fh:
        fh.write("position COMBINED_rate.cM.Mb. Genetic_Map.cM.\n")
        for p, r, c in zip(pos, rate, cm):
            fh.write(f"{p} {r:.10g} {c:.10g}\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("recomb_dir")
    ap.add_argument("panel")
    ap.add_argument("chr")
    ap.add_argument("--liftover", default=None,
                    help="path to the UCSC liftOver binary")
    ap.add_argument("--chain", default=None,
                    help="hg19ToHg38.over.chain.gz path")
    ap.add_argument("--lifted", default=None,
                    help="pre-lifted intervals file (skip liftOver); "
                         "requires --unmapped")
    ap.add_argument("--unmapped", default=None,
                    help="liftOver's unmapped-records file matching "
                         "--lifted, so each lifted row pairs with its "
                         "true source interval")
    ap.add_argument("--no-smooth", action="store_true")
    args = ap.parse_args(argv)
    src = os.path.join(args.recomb_dir, args.panel,
                       f"{args.panel}-{args.chr}-final.txt.gz")
    pos, rate = load_b37_rates(src)
    rows = intervals_for_liftover(args.chr, pos, rate)
    if args.lifted:
        # pair each lifted row with its true source interval: liftOver
        # preserves input order but DROPS unmapped intervals anywhere in
        # the file, so a head-slice pairing would silently misalign every
        # row after the first dropped one (and clean_lifted's size-change
        # filter would then compare wrong pairs)
        if not args.unmapped:
            print("--lifted requires --unmapped (liftOver's unmapped "
                  "output) so rows pair with their true source intervals",
                  file=sys.stderr)
            return 1
        lifted = read_lifted_file(args.lifted)
        unmapped_starts = set()
        with open(args.unmapped) as fh:
            for line in fh:
                if line.startswith("#") or not line.strip():
                    continue
                p = line.split()
                unmapped_starts.add(int(p[1]))
        originals = [r for r in rows if r[1] not in unmapped_starts]
    elif args.liftover and args.chain:
        lifted, originals = run_liftover(
            rows, args.liftover, args.chain,
            os.path.join(args.recomb_dir, args.panel),
        )
    else:
        print("need --liftover+--chain or --lifted", file=sys.stderr)
        return 1
    clean = clean_lifted(args.chr, lifted, originals)
    filled = fill_gaps(args.chr, clean)
    pos38, rate38, cm38 = build_map(filled, smooth=not args.no_smooth)
    out = os.path.join(args.recomb_dir, args.panel,
                       f"{args.panel}-{args.chr}-final.b38.txt.gz")
    write_map(out, pos38, rate38, cm38)
    print(f"Wrote {out}: {len(pos38)} positions, "
          f"{cm38[-1]:.2f} cM total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
