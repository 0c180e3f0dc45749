import numpy as np

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, trans_rates
from quilt_tpu.oracle import gibbs_sample_one_chain
from quilt_tpu.oracle.emissions import make_emat_read


def diploid_setup(rng, K=60, nSNPs=320, coverage=2.0, read_len=600, phred=25):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=coverage, read_length_bp=read_len,
        phred=phred,
    )
    sigma = np.full(nGrids - 1, 0.99)
    trans = trans_rates(sigma)
    return haps, pos, grid, nGrids, truth, reads, sim, trans


def test_gibbs_diploid_recovers_genotypes(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = diploid_setup(rng)
    n_its = 13
    uniforms = rng.random((n_its, reads.nReads))
    H_init = rng.integers(0, 2, reads.nReads)
    res = gibbs_sample_one_chain(
        reads=reads,
        hap_alleles=haps,
        grid=grid,
        trans=trans,
        n_latent=2,
        ff=0.0,
        uniforms=uniforms,
        H_init=H_init,
        nGrids=nGrids,
        iterative_init=True,
        n_burn_in_its=n_its - 1,
        n_sample_its=1,
    )
    assert not res.underflow
    gp_sum = res.genProbs.sum(axis=0)
    np.testing.assert_allclose(gp_sum, 1.0, atol=2e-3)
    dosage = res.genProbs[1] + 2 * res.genProbs[2]
    truth_g = truth.sum(axis=0)
    r2 = np.corrcoef(dosage, truth_g)[0, 1] ** 2
    assert r2 > 0.85, f"r2 too low: {r2}"


def test_gibbs_read_labels_partition(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = diploid_setup(
        rng, coverage=4.0, read_len=2000, phred=30
    )
    n_its = 13
    uniforms = rng.random((n_its, reads.nReads))
    H_init = rng.integers(0, 2, reads.nReads)
    res = gibbs_sample_one_chain(
        reads=reads,
        hap_alleles=haps,
        grid=grid,
        trans=trans,
        n_latent=2,
        ff=0.0,
        uniforms=uniforms,
        H_init=H_init,
        nGrids=nGrids,
        n_burn_in_its=n_its - 1,
        n_sample_its=1,
    )
    # read labels should match the simulated labels up to global swap,
    # for reads that are informative
    em = make_emat_read(reads, truth.astype(np.uint8))
    informative = np.abs(np.log(em[0] / em[1])) > 1.0
    agree = (res.H == sim.labels)[informative].mean()
    assert max(agree, 1 - agree) > 0.9, f"label agreement {agree}"


def test_gibbs_deterministic(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = diploid_setup(rng)
    uniforms = rng.random((6, reads.nReads))
    H_init = rng.integers(0, 2, reads.nReads)
    kw = dict(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=2,
        ff=0.0, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        n_burn_in_its=5, n_sample_its=1,
    )
    r1 = gibbs_sample_one_chain(**kw)
    r2 = gibbs_sample_one_chain(**kw)
    np.testing.assert_array_equal(r1.H, r2.H)
    np.testing.assert_allclose(r1.genProbs, r2.genProbs)
