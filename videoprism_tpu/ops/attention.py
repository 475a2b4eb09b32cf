"""Multi-head dot-product attention with tanh logit soft-cap.

Functional re-implementation of the reference attention stack
(``AttentionProjection``, ``PerDimScale``, ``DotProductAttention``; reference
videoprism/layers.py:433-746) with two interchangeable inner loops:

  * ``impl='xla'``   — straight jnp einsums; numerically the ground truth.
  * ``impl='flash'`` — Pallas TPU flash-attention kernel with the tanh logit
    cap folded into the online softmax (``videoprism_tpu.ops.pallas``).

Projection weights keep the checkpoint layout **(D, N, H)** for q/k/v and
post (reference videoprism/layers.py:433-499); this layout is the checkpoint
schema and also shards naturally over a tensor-parallel mesh axis on N.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.ops import basic
from videoprism_tpu.ops import masks as mask_lib

Array = jax.Array
Params = dict[str, Any]


def attention_projection(
    params: Params,
    inputs: Array,
    *,
    is_output_projection: bool = False,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Array:
  """Multi-head input/output projection with (D, N, H) weights.

  Input projection:  ``...D, DNH -> ...NH``
  Output projection: ``...NH, DNH -> ...D``
  Reference: videoprism/layers.py:454-499.
  """
  w = basic.cast_floating(params['w'], dtype)
  if is_output_projection:
    ret = jnp.einsum('...NH,DNH->...D', inputs, w)
  else:
    ret = jnp.einsum('...D,DNH->...NH', inputs, w)
  if use_bias:
    ret = ret + basic.cast_floating(params['b'], dtype)
  return ret


def _scale_query(
    params: Params,
    query: Array,
    *,
    enable_query_scale: bool,
    enable_per_dim_scale: bool,
    dim_per_head: int,
    dtype,
) -> Array:
  """Query scaling (reference videoprism/layers.py:569-584).

  Either the learned softplus per-dim scale, or the classical
  ``dim_per_head ** -0.5``.
  """
  if not enable_query_scale:
    return query
  if enable_per_dim_scale:
    return basic.per_dim_scale(params['per_dim_scale'], query, dtype=dtype)
  return query * (dim_per_head**-0.5)


def _cap_logits(logits: Array, cap: float, dtype) -> Array:
  """Tanh soft-cap: ``cap * tanh(logits / cap)``.

  Applied *before* masking — the cap squashes both signs so the
  very-negative mask values must be injected afterwards (reference
  videoprism/layers.py:586-594).
  """
  if not cap or cap <= 0.0:
    return logits
  cap_arr = jnp.array(cap, dtype=dtype)
  return cap_arr * jnp.tanh(logits / cap_arr)


def dot_atten(
    query: Array,
    key: Array,
    value: Array,
    atten_mask: Array,
    *,
    logit_cap: float = 0.0,
    scale_logits_by_head_dims: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
    dtype=jnp.float32,
) -> tuple[Array, Array]:
  """Core attention over projected heads ([B,T,N,H] x [B,S,N,H]).

  Logits ``BTNH,BSNH->BNTS``; tanh cap; fp32 softmax; select-masking.
  Reference: videoprism/layers.py:601-661.

  Returns (encoded [B,T,N,H], probs [B,N,T,S]).
  """
  logits = jnp.einsum('BTNH,BSNH->BNTS', query, key)
  if scale_logits_by_head_dims:
    logits = logits * (1.0 / np.sqrt(key.shape[-1]))
  logits = _cap_logits(logits, logit_cap, dtype)
  # Softmax always in fp32 (reference videoprism/layers.py:650-654).
  logits = logits.astype(jnp.float32)
  padded_logits = mask_lib.apply_mask_to_logits(logits, atten_mask)
  probs = jax.nn.softmax(padded_logits, axis=-1).astype(dtype)
  probs = basic.dropout(
      dropout_rng, probs, dropout_rate, deterministic=not train
  )
  encoded = jnp.einsum('BNTS,BSNH->BTNH', probs, value)
  return encoded, probs


def _dot_atten_head_major(
    query: Array,   # [B, N, T, H]
    key: Array,     # [B, N, S, H]
    value: Array,   # [B, N, S, H]
    atten_mask: Array,
    *,
    logit_cap: float = 0.0,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
    dtype=jnp.float32,
) -> Array:
  """Head-major twin of :func:`dot_atten` (same math, [B,N,T,H] layout).

  The layout matches both the MXU-batched matmul and the Pallas kernel, so
  no transposes appear anywhere on the attention path.
  """
  logits = jnp.einsum('BNTH,BNSH->BNTS', query, key)
  logits = _cap_logits(logits, logit_cap, dtype)
  logits = logits.astype(jnp.float32)
  padded_logits = mask_lib.apply_mask_to_logits(logits, atten_mask)
  probs = jax.nn.softmax(padded_logits, axis=-1).astype(dtype)
  probs = basic.dropout(
      dropout_rng, probs, dropout_rate, deterministic=not train)
  return jnp.einsum('BNTS,BNSH->BNTH', probs, value)


def multi_head_attention(
    params: Params,
    query_vec: Array,
    key_vec: Array,
    value_vec: Array,
    atten_mask: Array,
    *,
    hidden_dim: int,
    num_heads: int,
    dim_per_head: int | None = None,
    logit_cap: float = 0.0,
    enable_query_scale: bool = True,
    enable_per_dim_scale: bool = True,
    scale_logits_by_head_dims: bool = False,
    use_qk_norm: bool = False,
    use_bias: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    train: bool = False,
    dtype=jnp.float32,
    impl: str = 'xla',
    tp_axis: str | None = None,
    interpret: bool = False,
) -> Array:
  """Full MHA: q/k/v projections, attention, post projection.

  ``tp_axis``: manual tensor parallelism — params are head-sharded over
  that shard_map axis, so the post projection contracts only this shard's
  heads; the partial outputs are psum-reduced before the (replicated)
  bias is added.

  Param tree (checkpoint schema, reference videoprism/layers.py:685-746)::

      {'query': {'w': [D, N, H], 'b': [N, H]},
       'key':   {...}, 'value': {...},
       'post':  {'w': [Dq, N, H], 'b': [Dq]},
       'per_dim_scale': {'per_dim_scale': [H]},       # if per-dim scale
       'layer_norm_q' / 'layer_norm_k': {...}}        # if qk-norm

  Returns encoded [B, T, Dq].
  """
  if dim_per_head is None:
    dim_per_head = hidden_dim // num_heads
    assert dim_per_head * num_heads == hidden_dim
  if tp_axis is not None:
    # Per-shard head count comes from the sharded param shapes; the global
    # num_heads only fixes dim_per_head (unchanged under head sharding).
    num_heads = params['query']['w'].shape[1]

  # Project straight into head-major [B, N, T, H]: the layout the MXU
  # batched matmuls and the Pallas kernel want, with zero transposes.
  def proj(name, x):
    w = basic.cast_floating(params[name]['w'], dtype)
    out = jnp.einsum('BTD,DNH->BNTH', x, w)
    if use_bias:
      b = basic.cast_floating(params[name]['b'], dtype)
      out = out + b[:, jnp.newaxis, :]
    return out

  query_proj = proj('query', query_vec)  # [B, N, T, H]
  key_proj = proj('key', key_vec)        # [B, N, S, H]
  value_proj = proj('value', value_vec)  # [B, N, S, H]

  if use_qk_norm:
    query_proj = basic.layer_norm(
        params['layer_norm_q'], query_proj, use_bias=use_bias, dtype=dtype)
    key_proj = basic.layer_norm(
        params['layer_norm_k'], key_proj, use_bias=use_bias, dtype=dtype)

  query_proj = _scale_query(
      params,
      query_proj,
      enable_query_scale=enable_query_scale,
      enable_per_dim_scale=enable_per_dim_scale,
      dim_per_head=dim_per_head,
      dtype=dtype,
  )
  if scale_logits_by_head_dims:
    # Equivalent to scaling the logits (linear); applied here so both the
    # flash and XLA branches honor the flag.
    query_proj = query_proj * (1.0 / np.sqrt(key_proj.shape[-1]))

  # The kernel is trainable (custom_vjp with a composed backward) but has
  # no dropout path; dropout-in-training falls back to XLA.
  use_flash = impl == 'flash' and not (train and dropout_rate > 0.0)
  if use_flash:
    from videoprism_tpu.ops.pallas import flash_attention as flash

    encoded = flash.flash_attention_head_major(
        query_proj, key_proj, value_proj, atten_mask,
        logit_cap=logit_cap, dtype=dtype, interpret=interpret,
    )
  else:
    encoded = _dot_atten_head_major(
        query_proj, key_proj, value_proj, atten_mask,
        logit_cap=logit_cap,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        train=train,
        dtype=dtype,
    )

  # Output projection from head-major: 'BNTH,DNH->BTD'.
  w = basic.cast_floating(params['post']['w'], dtype)
  out = jnp.einsum('BNTH,DNH->BTD', encoded, w)
  if tp_axis is not None:
    out = jax.lax.psum(out, tp_axis)
  if use_bias:
    out = out + basic.cast_floating(params['post']['b'], dtype)
  return out


def pooling_projections(
    params: Params,
    tokens: Array,            # [B, S, D]
    *,
    num_heads: int,
    hidden_dim: int,
    enable_per_dim_scale: bool = True,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> tuple[Array, Array, Array]:
  """Head-major (q, k, v) for an ``atten_token_pooling`` param tree.

  The learned query vectors tile over the batch and get the standard
  query scaling; keys/values project from ``tokens``.  Shared by the
  partial-attention poolers that re-combine softmax statistics
  themselves: the sequence-parallel pooler
  (:mod:`videoprism_tpu.parallel.sp`, psum across shards) and the
  streaming online-softmax pooler (:mod:`videoprism_tpu.streaming`,
  sequential rescale-and-accumulate).

  Returns ``(q [B,N,Q,H], k [B,N,S,H], v [B,N,S,H])``.
  """
  dim_per_head = hidden_dim // num_heads
  assert dim_per_head * num_heads == hidden_dim
  batch_size = tokens.shape[0]

  query_vec = basic.cast_floating(params['pooling_attention_query'], dtype)
  query_vec = jnp.tile(query_vec[jnp.newaxis], [batch_size, 1, 1])
  mha = params['pooling_attention']

  def proj(name, x):
    w = basic.cast_floating(mha[name]['w'], dtype)
    out = jnp.einsum('BTD,DNH->BNTH', x, w)
    if use_bias:
      out = out + basic.cast_floating(mha[name]['b'], dtype)[:, jnp.newaxis]
    return out

  q = proj('query', query_vec)
  k = proj('key', tokens)
  v = proj('value', tokens)
  if enable_per_dim_scale:
    q = basic.per_dim_scale(mha['per_dim_scale'], q, dtype=dtype)
  else:
    q = q * (dim_per_head ** -0.5)
  return q, k, v
