from .sample import impute_one_sample, SampleResult
from .driver import quilt_impute

__all__ = ["impute_one_sample", "SampleResult", "quilt_impute"]
