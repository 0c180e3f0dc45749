import numpy as np

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, trans_rates, make_smoothed_rate
from quilt_tpu.oracle import gibbs_sample_one_chain
from quilt_tpu.oracle.block_gibbs import detect_boundaries
from quilt_tpu.kernels import PaddedReads
from quilt_tpu.kernels.gibbs import GibbsInputs, run_gibbs_chains


def test_block_gibbs_kernel_matches_oracle(rng):
    K, nSNPs = 48, 320
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=3.0, read_length_bp=800, phred=28
    )
    sigma = rng.uniform(0.9, 0.999, nGrids - 1)
    trans = trans_rates(sigma)
    smooth = make_smoothed_rate(sigma, L_grid, 5000)
    boundaries = detect_boundaries(smooth, 0.7)
    assert len(boundaries) >= 1
    n_its = 8
    block_its = [3, 5]
    uniforms = rng.random((n_its, reads.nReads))
    block_u = rng.random((len(block_its), len(boundaries), 1))
    H_init = rng.integers(0, 2, reads.nReads)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=2,
        ff=0.0, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
        block_gibbs_iterations=block_its,
        smooth_cm=smooth,
        block_uniforms=block_u,
        block_gibbs_quantile_prob=0.7,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    bu = np.zeros((n_its, len(boundaries), 3, 1), dtype=np.float32)
    do_block = np.zeros(n_its, dtype=bool)
    for i, bit in enumerate(block_its):
        do_block[bit - 1] = True
        bu[bit - 1, :, 0, 0] = block_u[i, :, 0]
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits = np.zeros((1, K, S), dtype=np.uint8)
    bits[0, :, :nSNPs] = haps
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=2, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
        boundaries=boundaries.astype(np.int32), block_u=bu, do_block=do_block,
    )
    assert not uf[0]
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.98, f"informative label agreement with block moves {agree}"
    dos_k = gp[0, 1, :nSNPs] + 2 * gp[0, 2, :nSNPs]
    dos_o = oracle.genProbs[1] + 2 * oracle.genProbs[2]
    r2 = np.corrcoef(dos_k, dos_o)[0, 1] ** 2
    assert r2 > 0.995, f"dosage r2 vs oracle {r2}"


def test_block_move_fixes_phase_switch(rng):
    """A deliberately mis-phased suffix must be correctable by block moves."""
    K, nSNPs = 40, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs, region_span=150_000)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=8.0, read_length_bp=2500, phred=30
    )
    trans = trans_rates(np.full(nGrids - 1, 0.98))
    # H init: truth labels but flipped for the suffix half (phase switch)
    b = nGrids // 2
    H_init = sim.labels.astype(np.int64).copy()
    sfx = reads.wif0 >= b
    H_init[sfx] = 1 - H_init[sfx]
    n_its = 4
    boundaries = np.array([b], dtype=np.int32)
    bu = np.full((n_its, 1, 3, 1), 0.5, dtype=np.float32)
    do_block = np.zeros(n_its, dtype=bool)
    do_block[1] = True
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = rng.random((n_its, 1, R)).astype(np.float32)
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads)
    S = nGrids * 32
    bits = np.zeros((1, K, S), dtype=np.uint8)
    bits[0, :, :nSNPs] = haps
    kw = dict(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=2, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=False, K_real=K,
    )
    # without block moves the phase switch persists (no single-read flips)
    _, _, _, H_no, _, _, _ = run_gibbs_chains(**kw)
    agree_no = (H_no[0, : reads.nReads] == sim.labels).mean()
    # with block moves the suffix swap should be accepted
    _, _, _, H_yes, _, _, _ = run_gibbs_chains(
        **kw, boundaries=boundaries, block_u=bu, do_block=do_block,
    )
    agree_yes = (H_yes[0, : reads.nReads] == sim.labels).mean()
    assert agree_yes > agree_no + 0.15, (
        f"block move did not improve labels: {agree_no} -> {agree_yes}"
    )
    assert agree_yes > 0.75, f"block move did not fix switch: {agree_yes}"


def test_block_gibbs_nipt_6perm_matches_oracle(rng):
    """NIPT 6-permutation block relabelling + H_class: kernel vs oracle."""
    K, nSNPs = 40, 288
    ff = 0.25
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=4.0, read_length_bp=800, phred=28,
        ff=ff,
    )
    sigma = rng.uniform(0.9, 0.999, nGrids - 1)
    trans = trans_rates(sigma)
    smooth = make_smoothed_rate(sigma, L_grid, 5000)
    boundaries = detect_boundaries(smooth, 0.7)
    assert len(boundaries) >= 1
    n_its = 8
    block_its = [3, 5]
    uniforms = rng.random((n_its, reads.nReads))
    block_u = rng.random((len(block_its), len(boundaries), 3))
    H_init = rng.choice(3, size=reads.nReads,
                        p=[0.5, (1 - ff) / 2, ff / 2]).astype(np.int64)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=3,
        ff=ff, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
        block_gibbs_iterations=block_its,
        smooth_cm=smooth,
        block_uniforms=block_u,
        block_gibbs_quantile_prob=0.7,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    bu = np.zeros((n_its, len(boundaries), 3, 1), dtype=np.float32)
    do_block = np.zeros(n_its, dtype=bool)
    for i, bit in enumerate(block_its):
        do_block[bit - 1] = True
        bu[bit - 1, :, 0, 0] = block_u[i, :, 0]
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits = np.zeros((1, K, S), dtype=np.uint8)
    bits[0, :, :nSNPs] = haps
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=3, ff=ff,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
        boundaries=boundaries.astype(np.int32), block_u=bu, do_block=do_block,
        block_within=False,     # this test pins the shard suffix variant
    )
    assert not uf[0]
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.95, f"NIPT label agreement with 6-perm moves {agree}"
    cls_agree = (
        Hcls[0, : reads.nReads] == oracle.H_class
    )[informative].mean()
    assert cls_agree > 0.9, f"H_class agreement {cls_agree}"
    # classified reads exist and use the pairwise-ambiguous codes too
    assert (oracle.H_class[informative] > 0).mean() > 0.5
    dos_k = gp[0, 1, :nSNPs] + 2 * gp[0, 2, :nSNPs]
    dos_o = oracle.genProbs[1] + 2 * oracle.genProbs[2]
    r2 = np.corrcoef(dos_k, dos_o)[0, 1] ** 2
    assert r2 > 0.99, f"maternal dosage r2 vs oracle {r2}"
    fet_k = gpF[0, 1, :nSNPs] + 2 * gpF[0, 2, :nSNPs]
    fet_o = oracle.genProbsF[1] + 2 * oracle.genProbsF[2]
    r2f = np.corrcoef(fet_k, fet_o)[0, 1] ** 2
    assert r2f > 0.98, f"fetal dosage r2 vs oracle {r2f}"
    # per-iteration likelihood matrix: 8 columns, p_O split per hap
    assert ll.shape[2] == 8
    np.testing.assert_allclose(
        ll[:, 0, 3], oracle.per_it_likelihoods[:, 3], rtol=2e-3, atol=2.0
    )


def test_entire_relabelling_kernel_matches_oracle(rng):
    """NIPT entire-relabelling move: kernel vs oracle, relabel column."""
    K, nSNPs = 32, 192
    ff = 0.3
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=3.0, read_length_bp=600, phred=28,
        ff=ff,
    )
    trans = trans_rates(np.full(nGrids - 1, 0.985))
    n_its = 5
    uniforms = rng.random((n_its, reads.nReads))
    relabel_u = rng.random(n_its)
    H_init = rng.choice(3, size=reads.nReads,
                        p=[0.5, (1 - ff) / 2, ff / 2]).astype(np.int64)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=3,
        ff=ff, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
        relabel_uniforms=relabel_u, do_entire_relabelling=True,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits = np.zeros((1, K, S), dtype=np.uint8)
    bits[0, :, :nSNPs] = haps
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=3, ff=ff,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
        relabel_u=relabel_u[:, None].astype(np.float32), do_entire=True,
    )
    assert not uf[0]
    np.testing.assert_array_equal(
        ll[:, 0, 7].astype(int), oracle.per_it_likelihoods[:, 7].astype(int)
    )
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.95, f"label agreement with entire relabelling {agree}"


def test_block_gibbs_nipt_within_matches_oracle(rng):
    """WITHIN-block relabelling + resample_H_using_H_class (the reference's
    production NIPT move set, Rcpp_block_gibbs_resampler block_approach=6):
    device kernel vs the sequential NumPy oracle."""
    K, nSNPs = 40, 288
    ff = 0.25
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=4.0, read_length_bp=800, phred=28,
        ff=ff,
    )
    sigma = rng.uniform(0.9, 0.999, nGrids - 1)
    trans = trans_rates(sigma)
    smooth = make_smoothed_rate(sigma, L_grid, 5000)
    boundaries = detect_boundaries(smooth, 0.7)
    assert len(boundaries) >= 1
    n_its = 8
    block_its = [3, 5]
    uniforms = rng.random((n_its, reads.nReads))
    block_u = rng.random((len(block_its), len(boundaries), 3))
    resample_u_full = rng.random((n_its, reads.nReads))
    H_init = rng.choice(3, size=reads.nReads,
                        p=[0.5, (1 - ff) / 2, ff / 2]).astype(np.int64)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=3,
        ff=ff, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
        block_gibbs_iterations=block_its,
        smooth_cm=smooth,
        block_uniforms=block_u,
        block_gibbs_quantile_prob=0.7,
        block_within=True,
        resample_uniforms=resample_u_full,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    ru_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    ru_pad[:, 0, : reads.nReads] = resample_u_full
    bu = np.zeros((n_its, len(boundaries), 3, 1), dtype=np.float32)
    do_block = np.zeros(n_its, dtype=bool)
    for i, bit in enumerate(block_its):
        do_block[bit - 1] = True
        bu[bit - 1, :, 0, 0] = block_u[i, :, 0]
        bu[bit - 1, :, 1, 0] = block_u[i, :, 1]
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    S = nGrids * 32
    bits = np.zeros((1, K, S), dtype=np.uint8)
    bits[0, :, :nSNPs] = haps
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=3, ff=ff,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
        boundaries=boundaries.astype(np.int32), block_u=bu, do_block=do_block,
        block_within=True, resample_u=ru_pad,
    )
    assert not uf[0]
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.95, f"within-block label agreement {agree}"
    cls_agree = (
        Hcls[0, : reads.nReads] == oracle.H_class
    )[informative].mean()
    assert cls_agree > 0.9, f"H_class agreement {cls_agree}"
    dos_k = gp[0, 1, :nSNPs] + 2 * gp[0, 2, :nSNPs]
    dos_o = oracle.genProbs[1] + 2 * oracle.genProbs[2]
    r2 = np.corrcoef(dos_k, dos_o)[0, 1] ** 2
    assert r2 > 0.99, f"maternal dosage r2 vs oracle {r2}"
    fet_k = gpF[0, 1, :nSNPs] + 2 * gpF[0, 2, :nSNPs]
    fet_o = oracle.genProbsF[1] + 2 * oracle.genProbsF[2]
    r2f = np.corrcoef(fet_k, fet_o)[0, 1] ** 2
    assert r2f > 0.98, f"fetal dosage r2 vs oracle {r2f}"
