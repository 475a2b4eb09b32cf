"""Utility tier: profiling/observability helpers."""

from videoprism_tpu.utils import profiling

__all__ = ['profiling']
