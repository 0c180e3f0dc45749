from . import config

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: remote TPU compiles through the
    axon tunnel are slow (tens of seconds), so cache them across runs."""
    try:
        import jax

        # key the cache by host microarchitecture: XLA:CPU AOT artifacts
        # compiled on a host with different vector extensions load with a
        # feature-mismatch warning and can SIGILL/segfault mid-suite
        import hashlib
        import platform
        try:
            with open("/proc/cpuinfo") as fh:
                flags = next(
                    (ln for ln in fh if ln.startswith("flags")), ""
                )
        except OSError:
            flags = ""
        tag = hashlib.sha1(
            (platform.machine() + flags).encode()
        ).hexdigest()[:10]
        jax.config.update(
            "jax_compilation_cache_dir", f"/tmp/quilt_tpu_jax_cache_{tag}"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
