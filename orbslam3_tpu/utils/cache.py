"""Persistent XLA compilation cache helper.

The solvers in this package are big XLA programs; caching their
executables makes repeated runs (tests, benchmarks, replays) start in
seconds instead of minutes. Works on CPU and TPU backends.
"""

import hashlib
import os


def _host_key() -> str:
    """Fingerprint of the CPU microarchitecture this process runs on.

    XLA:CPU cache entries are AOT machine code compiled for the compiling
    host's feature set; loading them on a different machine (sandbox /
    container migration) changes float codegen subtly or SIGILLs outright
    (observed: a borderline VI-init numeric flip after a host swap).
    Keying the cache directory by the host's CPU flags makes a migrated
    session start a fresh cache instead of reloading foreign code.
    """
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                # flags alone are NOT enough: LLVM derives target features
                # (e.g. prefer-no-scatter) from the cpuid family/model that
                # two sandbox hosts can differ on while exposing identical
                # flag lists — observed as AOT-load feature-mismatch spam
                # after a host migration. Include the full identity tuple.
                if key in ("vendor_id", "cpu family", "model", "stepping", "model name"):
                    parts.append(line.strip())
                if key == "flags":
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                if key == "power management":  # end of first CPU block
                    break
        # The identity tuple is still not enough on this sandbox: two
        # different physical hosts expose the SAME virtualized cpuinfo
        # ("Intel(R) Xeon(R) Processor @ 2.60GHz", identical flags) while
        # LLVM's direct-cpuid detection differs (prefer-no-scatter/gather
        # hints), so AOT entries written by the previous host still load
        # with feature-mismatch warnings / SIGILL risk. The boot id
        # changes on every sandbox migration: include it so each host
        # gets a fresh cache (warm within a round, never foreign code).
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                parts.append(f.read().strip())
        except OSError:
            pass
        if parts:
            return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compile_cache(path: str = None):
    """`ORBSLAM3_TPU_CACHE_DIR` overrides the default
    `~/.cache/jax-<host-key>` (see `_host_key`)."""
    import jax

    if path is None:
        path = os.path.expanduser(f"~/.cache/jax-{_host_key()}")
    path = os.environ.get("ORBSLAM3_TPU_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
