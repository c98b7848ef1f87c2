"""Small shared utilities."""

from orbslam3_tpu.utils.cache import enable_compile_cache  # noqa: F401
