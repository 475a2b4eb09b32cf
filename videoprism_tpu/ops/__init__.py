"""Functional TPU-first NN ops for VideoPrism-TPU.

All ops are pure functions of ``(params, inputs, **static_config)``; parameter
dicts are keyed exactly like the public HuggingFace "repeated" checkpoints.
"""

from videoprism_tpu.ops import attention
from videoprism_tpu.ops import basic
from videoprism_tpu.ops import embeddings
from videoprism_tpu.ops import masks
from videoprism_tpu.ops import transformer

__all__ = ['attention', 'basic', 'embeddings', 'masks', 'transformer']
