"""Shared persistent XLA compile cache for the benchmark scripts: the big
TPU programs (deep NCSN++ trajectories, SD UNet pipelines) take 10+ minutes
to compile through the tunneled backend; caching makes re-runs of the same
config start in seconds. CPU runs skip the cache — its AOT artifacts are
machine-feature-specific and a cache written on another host triggers
loader warnings/SIGILL risk."""

import os


def enable_compile_cache():
    import jax

    if jax.default_backend() == "cpu":
        return
    path = os.path.expanduser("~/.cache/dpm_solver_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
