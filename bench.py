"""Benchmark: full-panel Li & Stephens HMM cell-updates/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric follows BASELINE.json: HMM cell updates per second per
chip through the fused forward-backward (dosage + top-K) kernel at the
QUILT quick-start scale (K ~ 5008 panel haplotypes x ~2000 grids, batch =
7 chains x 2 latent haps x 2 samples). One cell update = one K-state alpha
(or beta) update at one grid. vs_baseline is the ratio against the
reference's single-core C++/Eigen throughput measured proxy of 5e8
cell-updates/s (reference publishes no absolute numbers — SURVEY.md
section 6; this constant documents the assumed denominator).
"""
import json
import time

import numpy as np

REFERENCE_CELLS_PER_S = 5e8  # assumed QUILT C++/Eigen single-core throughput


def main():
    import jax
    from quilt_tpu.io import simulate_panel
    from quilt_tpu.panel import (
        assign_positions_to_grid,
        compress_panel,
        trans_rates,
    )
    from quilt_tpu.utils import pack_bits_32
    from quilt_tpu.kernels import FBInputs, fb_full_batched

    rng = np.random.default_rng(0)
    K, nSNPs, B = 5120, 65536, 28
    haps, pos = simulate_panel(
        rng, K=K, nSNPs=nSNPs, n_founders=32, region_span=4_000_000,
        mutation=0.0003,
    )
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    panel = compress_panel(rhb_t, nSNPs, nMaxDH=255)
    trans = trans_rates(np.full(nGrids - 1, 0.99))
    thinned = np.arange(0, nGrids, 10)
    inputs = FBInputs.build(panel, trans, thinned_grids=thinned)
    gl = np.ones((B, 2, nSNPs), dtype=np.float32)
    gl[:, :, :] = rng.uniform(0.05, 1.0, (B, 2, nSNPs)).astype(np.float32)

    # warm-up (compile)
    fb_full_batched(gl, inputs, K_top=8)
    n_rep = 3
    t0 = time.time()
    for _ in range(n_rep):
        dosage, ll, tv, ti = fb_full_batched(gl, inputs, K_top=8)
    dt = (time.time() - t0) / n_rep
    # forward + backward: 2 passes over B x K x nGrids cells
    cells = 2.0 * B * K * nGrids
    cells_per_s = cells / dt
    assert np.isfinite(dosage).all()
    print(
        json.dumps(
            {
                "metric": "hmm_cell_updates_per_s_per_chip",
                "value": round(cells_per_s, 1),
                "unit": "cells/s",
                "vs_baseline": round(cells_per_s / REFERENCE_CELLS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
