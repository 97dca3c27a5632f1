"""Utilities: compilation cache, TF1 checkpoint mapping, profiling."""
from feat3dnet_tpu.utils.cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
