import numpy as np
import pytest

from quilt_tpu.config import ImputeConfig
from quilt_tpu.engine.validators import (
    QuiltValidationError,
    validate_impute_config,
    validate_region_consistency,
)
from quilt_tpu.io import simulate_panel
from quilt_tpu.panel import prepare_panel


def test_config_validation():
    validate_impute_config(ImputeConfig())
    with pytest.raises(QuiltValidationError):
        validate_impute_config(ImputeConfig(regionStart=100))
    with pytest.raises(QuiltValidationError):
        validate_impute_config(ImputeConfig(regionStart=200, regionEnd=100))
    with pytest.raises(QuiltValidationError):
        validate_impute_config(ImputeConfig(nGibbsSamples=0))
    with pytest.raises(QuiltValidationError):
        validate_impute_config(
            ImputeConfig(small_ref_panel_block_gibbs_iterations=[0, 3])
        )
    with pytest.raises(QuiltValidationError):
        validate_impute_config(ImputeConfig(method="haploid"))
    with pytest.raises(QuiltValidationError):
        validate_impute_config(
            ImputeConfig(n_seek_its=2, n_burn_in_seek_its=2)
        )


def test_region_consistency(rng):
    haps, pos = simulate_panel(rng, K=10, nSNPs=64)
    prep = prepare_panel(
        chrom="1", pos=pos, ref_allele=np.array(["A"] * 64),
        alt_allele=np.array(["G"] * 64), haps=haps,
        regionStart=100, regionEnd=900000, buffer=500,
    )
    validate_region_consistency(
        prep, ImputeConfig(regionStart=100, regionEnd=900000, buffer=500)
    )
    with pytest.raises(QuiltValidationError):
        validate_region_consistency(
            prep, ImputeConfig(regionStart=100, regionEnd=900001, buffer=500)
        )


def test_mspbwt_requires_prepared_indices(rng):
    """impute2 (use_mspbwt default) against a reference prepared without
    mspbwt indices must raise a clear validation error, not a TypeError
    deep in the selection path (found by driving the CLI end-to-end)."""
    import numpy as np
    import pytest
    from quilt_tpu.config import ImputeConfig
    from quilt_tpu.engine.validators import (
        QuiltValidationError, validate_region_consistency,
    )
    from quilt_tpu.io import simulate_panel
    from quilt_tpu.panel import prepare_panel

    haps, pos = simulate_panel(rng, K=20, nSNPs=96)
    prep = prepare_panel(
        chrom="chr20", pos=pos,
        ref_allele=np.array(["A"] * 96), alt_allele=np.array(["G"] * 96),
        haps=haps, nMaxDH=16,
    )
    assert prep.ms_indices is None
    with pytest.raises(QuiltValidationError, match="mspbwt"):
        validate_region_consistency(prep, ImputeConfig(use_mspbwt=True))
    validate_region_consistency(prep, ImputeConfig())   # plain impute ok
