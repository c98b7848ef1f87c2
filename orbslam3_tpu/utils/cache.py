"""Persistent XLA compilation cache helper.

The solvers in this package are big XLA programs; caching their
executables makes repeated runs (tests, benchmarks, replays) start in
seconds instead of minutes. Works on CPU and TPU backends.
"""

import os


def enable_compile_cache(path: str = os.path.expanduser("~/.cache/jax")):
    """`ORBSLAM3_TPU_CACHE_DIR` overrides `path` — useful when a sandbox
    migrates hosts: CPU cache entries are AOT code compiled for the OLD
    host's CPU features, and loading them on a different machine changes
    float codegen (or worse, SIGILLs)."""
    import jax

    path = os.environ.get("ORBSLAM3_TPU_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
