"""Genetic-map build pipeline (tools/make_b38_recomb_map.py, the Python
equivalent of the reference's scripts/make_b38_recomb_map.R)."""
import gzip
import sys

import numpy as np

sys.path.insert(0, ".")


def test_map_build_identity_lift(tmp_path, rng):
    from tools.make_b38_recomb_map import (
        build_map, clean_lifted, fill_gaps, intervals_for_liftover,
        load_b37_rates, main, write_map,
    )

    n = 300
    pos = np.sort(rng.choice(np.arange(10_000, 2_000_000), n, replace=False))
    rate = rng.uniform(0.1, 5.0, n)
    d = tmp_path / "CEU"
    d.mkdir()
    with gzip.open(d / "CEU-20-final.txt.gz", "wt") as fh:
        fh.write("position COMBINED_rate(cM/Mb) Genetic_Map(cM)\n")
        cm = np.concatenate([[0], np.cumsum(rate[:-1] * np.diff(pos) / 1e6)])
        for p, r, c in zip(pos, rate, cm):
            fh.write(f"{p} {r} {c}\n")
    # identity "lift": same intervals, some dropped + one size change
    rows = intervals_for_liftover("20", pos, rate)
    lifted = []
    originals = []
    unmapped = []
    for i, (c, s, e, r) in enumerate(rows):
        if i % 37 == 5:
            unmapped.append((c, s, e, r))    # unmapped interval -> gap
            continue
        originals.append((c, s, e, r))
        if i % 53 == 7:
            lifted.append((c, s, e + 3, r))   # size change -> dropped
        else:
            lifted.append((c, s, e, r))
    lift_file = tmp_path / "lifted.txt"
    with open(lift_file, "w") as fh:
        for c, s, e, r in lifted:
            fh.write(f"{c} {s} {e} {r} X +\n")
    unmapped_file = tmp_path / "unmapped.txt"
    with open(unmapped_file, "w") as fh:
        for c, s, e, r in unmapped:
            fh.write(f"#Deleted in new\n{c} {s} {e} {r} X +\n")

    clean = clean_lifted("20", lifted, originals)
    assert len(clean) < len(rows)
    filled = fill_gaps("20", clean)
    # contiguity: no gaps remain
    for a, b in zip(filled[:-1], filled[1:]):
        assert a[2] == b[1]
    pos38, rate38, cm38 = build_map(filled)
    assert (np.diff(pos38) > 0).all()
    assert cm38[0] == 0 and np.isfinite(cm38).all()
    assert (np.diff(cm38) >= 0).all()
    # cumulative map integrates the (smoothed) rate column
    np.testing.assert_allclose(
        np.diff(cm38), rate38[:-1] * np.diff(pos38) / 1e6, rtol=1e-6
    )
    out = tmp_path / "map.b38.txt.gz"
    write_map(str(out), pos38, rate38, cm38)
    # the written map round-trips through the engine's reader
    from quilt_tpu.io.vcf import read_genetic_map
    gm = read_genetic_map(str(out))
    assert len(gm[0]) == len(pos38)

    # CLI end-to-end with --lifted + --unmapped (the unmapped file is
    # required so lifted rows pair with their true source intervals)
    rc = main([str(tmp_path), "CEU", "20", "--lifted", str(lift_file)])
    assert rc == 1                        # refused without --unmapped
    rc = main([str(tmp_path), "CEU", "20", "--lifted", str(lift_file),
               "--unmapped", str(unmapped_file)])
    assert rc == 0
    assert (d / "CEU-20-final.b38.txt.gz").exists()
