import numpy as np
import jax.numpy as jnp

from quilt_tpu.io import simulate_panel, simulate_sample_reads
from quilt_tpu.io.simulate import simulate_truth_mosaic
from quilt_tpu.panel import assign_positions_to_grid, trans_rates
from quilt_tpu.oracle import gibbs_sample_one_chain
from quilt_tpu.oracle.emissions import make_emat_read
from quilt_tpu.kernels import PaddedReads, emat_read_from_bits
from quilt_tpu.kernels.gibbs import GibbsInputs, run_gibbs_chains


def setup(rng, K=48, nSNPs=256, coverage=3.0, read_len=800, phred=28):
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=coverage, read_length_bp=read_len,
        phred=phred,
    )
    sigma = np.full(nGrids - 1, 0.985)
    trans = trans_rates(sigma)
    return haps, pos, grid, nGrids, truth, reads, sim, trans


def pad_bits(haps, nGrids):
    S = nGrids * 32
    K = haps.shape[0]
    bits = np.zeros((K, S), dtype=np.uint8)
    bits[:, : haps.shape[1]] = haps
    return bits


def test_emat_read_kernel_matches_oracle(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = setup(rng)
    oracle_em = make_emat_read(reads, haps, 0.001, 1e10)
    preads = PaddedReads.build(reads, ref_error=0.001)
    bits = pad_bits(haps, nGrids)[None]
    em = np.asarray(
        emat_read_from_bits(
            jnp.asarray(bits),
            jnp.asarray(preads.u_pad),
            jnp.asarray(preads.lr),
            jnp.asarray(preads.la),
            1e10,
        )
    )[0]
    np.testing.assert_allclose(em, oracle_em, rtol=2e-4, atol=2e-6)


def test_gibbs_kernel_matches_oracle(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = setup(rng)
    n_its = 9
    uniforms = rng.random((n_its, reads.nReads))
    H_init = rng.integers(0, 2, reads.nReads)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=2,
        ff=0.0, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    bits = pad_bits(haps, nGrids)[None]
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=2, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=True, K_real=haps.shape[0],
    )
    assert not uf[0]
    # informative reads must agree exactly; reads whose emissions are all
    # ~1 are resampled ~uniformly in fp64 but skipped in fp32 — exclude them
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.99, f"informative label agreement {agree}"
    dos_k = gp[0, 1, : len(pos)] + 2 * gp[0, 2, : len(pos)]
    dos_o = oracle.genProbs[1] + 2 * oracle.genProbs[2]
    r2 = np.corrcoef(dos_k, dos_o)[0, 1] ** 2
    assert r2 > 0.999, f"dosage r2 vs oracle {r2}"
    # accuracy vs truth
    truth_g = truth.sum(axis=0)
    r2t = np.corrcoef(dos_k, truth_g)[0, 1] ** 2
    assert r2t > 0.85, f"dosage r2 vs truth {r2t}"


def test_gibbs_kernel_batched_chains(rng):
    haps, pos, grid, nGrids, truth, reads, sim, trans = setup(rng, K=40)
    n_its = 6
    B = 3
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    uniforms = rng.random((n_its, B, R)).astype(np.float32)
    H0 = rng.integers(0, 2, (B, R)).astype(np.int32)
    preads = PaddedReads.build(reads)
    bits = np.broadcast_to(
        pad_bits(haps, nGrids)[None], (B, haps.shape[0], nGrids * 32)
    ).copy()
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=uniforms, H0=H0,
        first_read=np.zeros(B, dtype=np.int32), n_latent=2, ff=0.0,
        n_burn_in=n_its - 1, iterative_init=True, K_real=haps.shape[0],
    )
    assert gp.shape == (B, 3, nGrids * 32)
    assert not uf.any()
    truth_g = truth.sum(axis=0)
    for b in range(B):
        dos = gp[b, 1, : len(pos)] + 2 * gp[b, 2, : len(pos)]
        r2 = np.corrcoef(dos, truth_g)[0, 1] ** 2
        assert r2 > 0.8, f"chain {b}: r2 {r2}"
    # chains with different uniforms should not be identical
    assert not np.array_equal(H[0], H[1])


def test_gibbs_kernel_matches_oracle_nipt(rng):
    """Triploid (NIPT) kernel vs oracle equivalence."""
    K, nSNPs = 40, 256
    ff = 0.25
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=3)
    reads, sim = simulate_sample_reads(
        rng, truth, pos, grid, coverage=4.0, read_length_bp=800, phred=28,
        ff=ff,
    )
    sigma = np.full(nGrids - 1, 0.985)
    trans = trans_rates(sigma)
    n_its = 7
    uniforms = rng.random((n_its, reads.nReads))
    H_init = rng.choice(3, size=reads.nReads,
                        p=[0.5, (1 - ff) / 2, ff / 2]).astype(np.int64)
    oracle = gibbs_sample_one_chain(
        reads=reads, hap_alleles=haps, grid=grid, trans=trans, n_latent=3,
        ff=ff, uniforms=uniforms, H_init=H_init, nGrids=nGrids,
        iterative_init=True, first_read_init=0,
        n_burn_in_its=n_its - 1, n_sample_its=1,
    )
    inputs = GibbsInputs.build(reads, trans, nGrids)
    R = inputs.R
    u_pad = np.zeros((n_its, 1, R), dtype=np.float32)
    u_pad[:, 0, : reads.nReads] = uniforms
    H0 = np.zeros((1, R), dtype=np.int32)
    H0[0, : reads.nReads] = H_init
    preads = PaddedReads.build(reads, ref_error=0.001)
    bits = pad_bits(haps, nGrids)[None]
    gp, gpF, hap_dos, H, ll, uf, Hcls = run_gibbs_chains(
        bits=bits, preads=preads, inputs=inputs, uniforms=u_pad, H0=H0,
        first_read=np.zeros(1, dtype=np.int32), n_latent=3, ff=ff,
        n_burn_in=n_its - 1, iterative_init=True, K_real=K,
    )
    assert not uf[0]
    em_o = oracle.eMatRead
    informative = em_o.min(axis=0) < 0.5
    agree = (H[0, : reads.nReads] == oracle.H)[informative].mean()
    assert agree > 0.95, f"NIPT informative label agreement {agree}"
    # maternal genProbs
    dos_k = gp[0, 1, :nSNPs] + 2 * gp[0, 2, :nSNPs]
    dos_o = oracle.genProbs[1] + 2 * oracle.genProbs[2]
    r2 = np.corrcoef(dos_k, dos_o)[0, 1] ** 2
    assert r2 > 0.99, f"NIPT maternal dosage r2 vs oracle {r2}"
    # fetal genProbs
    dosF_k = gpF[0, 1, :nSNPs] + 2 * gpF[0, 2, :nSNPs]
    dosF_o = oracle.genProbsF[1] + 2 * oracle.genProbsF[2]
    r2f = np.corrcoef(dosF_k, dosF_o)[0, 1] ** 2
    assert r2f > 0.98, f"NIPT fetal dosage r2 vs oracle {r2f}"


def test_gibbs_packed_bits_equals_unpacked(rng):
    """run_gibbs_chains with PACKED panel words (int32/uint32 bits, the
    production layout) equals the unpacked uint8 path."""
    from quilt_tpu.io import simulate_panel, simulate_sample_reads
    from quilt_tpu.io.simulate import simulate_truth_mosaic
    from quilt_tpu.panel import assign_positions_to_grid, trans_rates
    from quilt_tpu.utils import pack_bits_32, unpack_bits_32
    from quilt_tpu.kernels.gibbs import GibbsInputs, run_gibbs_chains

    K, nSNPs = 64, 256
    haps, pos = simulate_panel(rng, K=K, nSNPs=nSNPs)
    rhb_t = pack_bits_32(haps)
    grid, L_grid, nGrids = assign_positions_to_grid(pos)
    truth = simulate_truth_mosaic(rng, haps, n_latent=2)
    reads, _ = simulate_sample_reads(
        rng, truth, pos, grid, coverage=1.5, read_length_bp=300
    )
    reads = reads.sorted_by_grid()
    trans = trans_rates(np.full(nGrids - 1, 0.98))
    gin = GibbsInputs.build(reads, trans, nGrids)
    pr = PaddedReads.build(reads, ref_error=0.001)
    C, n_its = 2, 6
    bits_u8 = np.broadcast_to(
        unpack_bits_32(rhb_t, nGrids * 32)[None], (C, K, nGrids * 32)
    )
    bits_pk = np.broadcast_to(rhb_t[None], (C, K, nGrids))
    uniforms = rng.random((n_its, C, gin.R)).astype(np.float32)
    H0 = rng.choice(2, size=(C, gin.R)).astype(np.int32)
    first = np.zeros(C, dtype=np.int32)
    outs = []
    for bits in (bits_u8, bits_pk):
        outs.append(run_gibbs_chains(
            bits=np.ascontiguousarray(bits), preads=pr, inputs=gin,
            uniforms=uniforms, H0=H0, first_read=first, n_latent=2,
            ff=0.0, n_burn_in=n_its - 1, iterative_init=False, K_real=K,
        ))
    for a, b, name in zip(outs[0], outs[1],
                          ("gp", "gpF", "hd", "H", "ll", "uf", "Hc")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
