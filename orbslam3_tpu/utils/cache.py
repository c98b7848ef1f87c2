"""Persistent XLA compilation cache helper.

The solvers in this package are big XLA programs; caching their
executables makes repeated runs (tests, benchmarks, replays) start in
seconds instead of minutes. Works on CPU and TPU backends.
"""

import os


def enable_compile_cache(path: str = os.path.expanduser("~/.cache/jax")):
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
