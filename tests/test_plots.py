import os
import numpy as np

from quilt_tpu.out.plots import plot_sample_diagnostics


def test_plot_diagnostics(tmp_path, rng):
    n = 200
    pos = np.arange(100, 100 + n * 10, 10)
    dosage = rng.random(n) * 2
    gp = rng.dirichlet([1, 1, 1], n).T
    out = plot_sample_diagnostics(
        str(tmp_path), "S1", "chr1", pos, dosage, gp,
        truth_gen=np.round(dosage),
        per_it_likelihoods=rng.random((10, 3, 2)) * -100,
    )
    assert out and os.path.exists(out)
    assert os.path.exists(
        str(tmp_path / "plots" / "haps.S1.chr1.diagnostics.tsv.gz")
    )
