"""Benchmark: full-panel Li & Stephens HMM cell-updates/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric follows BASELINE.json: HMM cell updates per second per
chip through the fused forward-backward (emissions + dosage + top-K) kernel
at QUILT quick-start scale (K = 5120 panel haplotypes x 2048 grids of 32
SNPs, batch = 7 chains x 2 latent haps x 2 samples). One cell update = one
K-state alpha (or beta) update at one grid. Inputs and outputs stay
device-resident, as they do across the engine's seek loop (the prepared
panel is uploaded once per region). vs_baseline is the ratio against an
assumed 5e8 cell-updates/s for the reference's single-core C++/Eigen
forward-backward (the reference publishes no absolute numbers —
SURVEY.md section 6; this constant documents the denominator).
"""
import json
import os
import time

import numpy as np

REFERENCE_CELLS_PER_S = 5e8  # assumed QUILT C++/Eigen single-core throughput
CACHE = "/tmp/quilt_tpu_bench_panel.npz"


def main():
    import jax
    from quilt_tpu.io import simulate_panel
    from quilt_tpu.panel import compress_panel, trans_rates
    from quilt_tpu.utils import pack_bits_32
    from quilt_tpu.kernels import FBInputs, fb_full_batched

    rng = np.random.default_rng(0)
    K, nSNPs, B = 5120, 65536, 28
    if os.path.exists(CACHE):
        rhb_t = np.load(CACHE)["rhb_t"]
    else:
        haps, pos = simulate_panel(
            rng, K=K, nSNPs=nSNPs, n_founders=32, region_span=4_000_000,
            mutation=0.0003,
        )
        rhb_t = pack_bits_32(haps)
        np.savez(CACHE, rhb_t=rhb_t)
    nGrids = nSNPs // 32
    panel = compress_panel(rhb_t, nSNPs, nMaxDH=255)
    trans = trans_rates(np.full(nGrids - 1, 0.99))
    thinned = np.arange(0, nGrids, 10)
    inputs = FBInputs.build(panel, trans, thinned_grids=thinned)
    gl = rng.uniform(0.05, 1.0, (B, 2, nSNPs)).astype(np.float32)

    # warm-up (compile + panel upload)
    out = fb_full_batched(gl, inputs, K_top=8, return_arrays=False)
    jax.block_until_ready(out)
    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        out = fb_full_batched(gl, inputs, K_top=8, return_arrays=False)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n_rep
    # sanity on results (fetch once, outside the timed loop)
    dosage = np.asarray(out[0])[:, :nSNPs]
    assert np.isfinite(dosage).all()
    assert dosage.min() > -0.02 and dosage.max() < 1.02  # bf16 matmul rounding
    cells = 2.0 * B * K * nGrids  # forward + backward passes
    cells_per_s = cells / dt
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
