"""Gibbs-sweep microbenchmark with component breakdown and the
batch-scaling table (VERDICT r2 item 2).

Times, on the bench chip at bench_full's workload shape:
- the full 21-sweep Gibbs call at chain-batch sizes {7..256}
  (the 'batching samples x chains is the lever' claim, measured; rows
  past the fused kernel's VMEM chain cap fall back to the XLA sweep and
  say so);
- a 1-iteration call (isolates per-call fixed costs from per-sweep cost);
- the forward and backward Pallas sweeps alone.

Writes BENCH_GIBBS.json next to this file. Run AFTER bench.py so the
compilation cache is warm.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import fast_packed_panel


def main():
    import jax
    import jax.numpy as jnp
    from quilt_tpu.io import simulate_panel, simulate_sample_reads
    from quilt_tpu.io.simulate import simulate_truth_mosaic
    from quilt_tpu.panel.prepare import (
        assign_positions_to_grid, trans_rates,
    )
    from quilt_tpu.kernels import PaddedReads
    from quilt_tpu.kernels.gibbs import GibbsInputs, run_gibbs_chains
    from quilt_tpu.kernels.common import pad_to_multiple
    from quilt_tpu.utils import unpack_bits_32

    rng = np.random.default_rng(0)
    K_panel, nSNPs = 5120, 16384
    rhb = fast_packed_panel(rng, K_panel, nSNPs // 32)
    haps = unpack_bits_32(rhb, nSNPs)
    pos = np.arange(1, nSNPs + 1, dtype=np.int64) * 60
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, _ = simulate_sample_reads(
        rng, truth, pos, grid, coverage=1.0, read_length_bp=600, phred=25
    )
    reads = reads.sorted_by_grid()
    sigma = np.full(nGrids - 1, 0.99)
    trans = trans_rates(sigma)
    ginputs = GibbsInputs.build(reads, trans, nGrids)
    preads = PaddedReads.build(reads, ref_error=0.001)
    Ksub = 600
    Kp = pad_to_multiple(Ksub, 128)
    which = np.sort(rng.choice(K_panel, Ksub, replace=False))
    sub = rhb[which]
    sub = np.concatenate([sub, np.repeat(sub[:1], Kp - Ksub, axis=0)], axis=0)
    bits1 = sub                         # packed words (production layout)

    results = {"device": str(jax.devices()[0]), "nReads": reads.nReads,
               "Ksubset": Ksub, "nGrids": nGrids}

    bits1_dev = jnp.asarray(bits1)
    jax.block_until_ready(bits1_dev)

    # production emission cache (engine/batch.py): whole-panel log
    # eMatRead built once per batch; per call = flat row gather + rescale
    from quilt_tpu.kernels.emissions import (
        ReadWindowCache, expand_panel_bf16, lem_full_from_cache, lem_subset,
    )
    wcache = ReadWindowCache(
        preads.u_pad[None], preads.lpr[None], preads.lpa[None],
        preads.mask[None], nGrids, lr=preads.lr[None], la=preads.la[None],
    )
    dh_, dl_ = wcache.diff
    E_full = expand_panel_bf16(jnp.asarray(rhb))
    lem_full = lem_full_from_cache(
        E_full, dh_, dl_, wcache.base, wcache.s0, wcache.Rc, wcache.Swin,
    )
    jax.block_until_ready(lem_full)
    which_p_dev = jnp.asarray(
        np.concatenate([which, np.repeat(which[:1], Kp - Ksub)])
        .astype(np.int32)
    )

    def timed_call(C, n_its, reps=3, use_lem=True):
        # device-resident inputs, as in the engine (bits are gathered from
        # the device panel per batch; uploading [C, K, S] through the
        # tunnel per call times the link, not the kernel)
        bits = jnp.broadcast_to(bits1_dev[None], (C, Kp, nGrids))
        bits = jax.device_put(bits).block_until_ready()
        uniforms = jnp.asarray(
            rng.random((n_its, C, ginputs.R)).astype(np.float32)
        )
        H0 = jnp.asarray(rng.choice(2, size=(C, ginputs.R)).astype(np.int32))
        first = rng.integers(0, reads.nReads, C).astype(np.int32)
        args = dict(
            bits=bits, preads=preads, inputs=ginputs, uniforms=uniforms,
            H0=H0, first_read=first, n_latent=2, ff=0.0,
            n_burn_in=n_its - 1, iterative_init=True, K_real=Ksub,
            return_arrays=False,
        )
        flat_idx = jnp.broadcast_to(which_p_dev[None], (C, Kp))

        def call():
            if use_lem:
                args["lem_read"] = lem_subset(
                    lem_full, flat_idx, 1e10, ginputs.R
                )
            out = run_gibbs_chains(**args)
            float(out[4].sum())
        call()                                # warm (compile)
        t0 = time.time()
        for _ in range(reps):
            call()
        return (time.time() - t0) / reps

    # batch scaling at 21 sweeps
    table = {}
    for C in (7, 28, 56, 112, 224, 256):
        from quilt_tpu.kernels.gibbs import _pallas_chunk_size
        from quilt_tpu.kernels.gibbs_pallas import padded_layout_ok
        dt = timed_call(C, 21)
        if padded_layout_ok(ginputs, B=C, K=Kp, nl=2):
            backend = "pallas"
        elif _pallas_chunk_size(ginputs, C, Kp, 2):
            backend = (
                f"pallas-chunked x{-(-C // _pallas_chunk_size(ginputs, C, Kp, 2))}"
            )
        else:
            backend = "xla-fallback"
        table[str(C)] = {
            "seconds_per_call": round(dt, 4),
            "read_resamples_per_s": round(21 * C * reads.nReads / dt, 1),
            "chain_sweeps_per_s": round(21 * C / dt, 2),
            "backend": backend,
        }
        print(f"C={C}: {dt:.3f}s -> {21*C*reads.nReads/dt:,.0f} resamples/s",
              flush=True)
    results["batch_scaling_21_sweeps"] = table

    # fixed-vs-per-sweep split at C=7
    d1 = timed_call(7, 2)
    d21 = table["7"]["seconds_per_call"]
    per_sweep = (d21 - d1) / 19.0
    results["c7_split"] = {
        "seconds_2_sweeps": round(d1, 4),
        "seconds_21_sweeps": d21,
        "marginal_seconds_per_sweep": round(per_sweep, 4),
    }
    print(f"marginal per-sweep: {per_sweep*1e3:.1f} ms", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "BENCH_GIBBS.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
