from . import config

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: remote TPU compiles through the
    axon tunnel are slow (tens of seconds), so cache them across runs."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/quilt_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
