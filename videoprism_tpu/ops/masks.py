"""Attention-mask utilities.

Semantics match the reference mask utilities (reference:
videoprism/layers.py:39-179): masks are *additive-style* float tensors where
``0`` means "attend" and ``-0.7 * dtype_max`` means "do not attend".  Masking
is applied to logits with a ``where``-select rather than an add — on TPU this
lets XLA keep only the predicate live instead of a full float32 logit-sized
buffer (see the fusion note at reference videoprism/layers.py:51-61).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def get_large_negative_number(dtype) -> Array:
  """Returns ``-0.7 * finfo(dtype).max`` (reference videoprism/layers.py:39-48)."""
  if jnp.issubdtype(dtype, jnp.inexact):
    dtype_max = jnp.finfo(dtype).max
  elif jnp.issubdtype(dtype, jnp.integer):
    dtype_max = jnp.iinfo(dtype).max
  else:
    raise ValueError('Unsupported dtype for masks.')
  return jnp.asarray(-0.7 * dtype_max, dtype=dtype)


def apply_mask_to_logits(logits: Array, mask: Array) -> Array:
  """Select-masks logits (reference videoprism/layers.py:51-72).

  Positions where ``mask`` is more negative than half the large-negative
  threshold are replaced by the large-negative value for ``logits.dtype``.
  """
  min_value = get_large_negative_number(logits.dtype)
  return jnp.where((mask >= min_value * 0.5), logits, min_value)


def paddings_to_mask(paddings: Array, dtype=jnp.float32) -> Array:
  """[B, T] binary paddings (1 = pad) -> [B, 1, 1, T] additive mask.

  Reference: videoprism/layers.py:75-89.
  """
  attention_mask = paddings[:, jnp.newaxis, jnp.newaxis, :]
  return attention_mask * get_large_negative_number(dtype)


def causal_mask(seq_len: int, dtype=jnp.float32) -> Array:
  """[1, 1, T, T] additive causal mask (reference videoprism/layers.py:92-108)."""
  large_negative_number = get_large_negative_number(dtype)
  col_idx = jnp.arange(seq_len)[jnp.newaxis, :]
  row_idx = jnp.arange(seq_len)[:, jnp.newaxis]
  mask = (row_idx < col_idx).astype(dtype) * large_negative_number
  return mask[jnp.newaxis, jnp.newaxis, :, :]


def merge_masks(a: Array, b: Array) -> Array:
  """Merges two additive masks, taking the elementwise minimum.

  If one mask is [.., 1, S] (key-only) and the other is [.., T, S], the
  key-only mask is first expanded to 2-D by ``min(query_mask, key_mask)``.
  Reference: videoprism/layers.py:111-152.
  """

  def expand_t(key_mask: Array) -> Array:
    query_mask = jnp.transpose(key_mask, [0, 1, 3, 2])
    return jnp.minimum(query_mask, key_mask)

  if a.shape[-2] != b.shape[-2]:
    if a.shape[-2] == 1:
      a = expand_t(a)
    else:
      assert b.shape[-2] == 1
      b = expand_t(b)

  assert a.shape[-3:] == b.shape[-3:], f'a.shape={a.shape}, b.shape={b.shape}.'
  return jnp.minimum(a, b)


def attention_mask_for_fprop(
    inputs: Array,
    paddings: Array,
    causal_attention: bool = False,
) -> Array:
  """Builds the self-attention mask for a [B, T, D] sequence.

  Reference: videoprism/layers.py:155-179.

  Args:
    inputs: [B, T, D] activations — only ``dtype`` and ``T`` are used.
    paddings: [B, T] binary paddings (1 = pad).
    causal_attention: Whether to merge in a causal mask.

  Returns:
    [1|B, 1, 1|T, T] additive mask ready for ``apply_mask_to_logits``.
  """
  attention_mask = paddings_to_mask(paddings, inputs.dtype)
  if causal_attention:
    attention_mask = merge_masks(
        attention_mask, causal_mask(inputs.shape[-2], inputs.dtype)
    )
  return attention_mask
