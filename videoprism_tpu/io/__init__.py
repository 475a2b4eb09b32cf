"""I/O tier: checkpoints, tokenizers, text canonicalization, video loading."""

from videoprism_tpu.io import checkpoints
from videoprism_tpu.io import text

__all__ = ['checkpoints', 'text']
