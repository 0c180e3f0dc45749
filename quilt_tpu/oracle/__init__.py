"""Plain-NumPy float64 oracle implementations of every device kernel.

These mirror the reference's pure-R kernel mirrors (QUILT/R/gibbs-nipt.R,
reference-single.R, gibbs-small.R — see SURVEY.md section 4): slow, readable,
and used by the test suite to verify the JAX/Pallas kernels numerically.
"""
from .emissions import (
    make_emat_read,
    make_gl_from_reads,
    build_emat_dh,
)
from .fb_full import haploid_dosage_versus_refs
from .gibbs import gibbs_sample_one_chain, GibbsResult

__all__ = [
    "make_emat_read",
    "make_gl_from_reads",
    "build_emat_dh",
    "haploid_dosage_versus_refs",
    "gibbs_sample_one_chain",
    "GibbsResult",
]
