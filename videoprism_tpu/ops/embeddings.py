"""Token / positional embeddings and pos-emb interpolation.

Functional re-implementation of the reference embedding layers
(videoprism/encoders.py:168-307) and the bilinear pos-emb interpolation
helpers (videoprism/encoders.py:107-165).  Interpolation reuses
``jax.image.resize(method='bilinear')`` so half-pixel-center semantics match
the checkpoints' original training-time behavior bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.ops import basic

Array = jax.Array
Params = dict[str, Any]


def token_embedding(
    params: Params,
    ids: Array,
    *,
    num_classes: int,
    scale_sqrt_depth: bool = False,
    set_nan_for_oob_id: bool = False,
    lookup_style: str = 'index',
    dtype=jnp.float32,
) -> Array:
  """Token-id embedding lookup; params ``{'emb_var': [V, D]}``.

  ``scale_sqrt_depth`` multiplies the result by ``sqrt(D)`` (CoCa text tower
  convention).  Reference: ``Embedding`` videoprism/encoders.py:189-224.
  """
  emb_var = basic.cast_floating(params['emb_var'], dtype)
  if lookup_style == 'index':
    embs = emb_var[(ids,)]
  elif lookup_style == 'matmul':
    one_hot_ids = jax.nn.one_hot(ids, num_classes, dtype=dtype)
    embs = jnp.einsum('...y,yz->...z', one_hot_ids, emb_var)
  else:
    raise ValueError(f'Unknown lookup style: `{lookup_style}`.')

  if set_nan_for_oob_id:
    embs = jnp.where(ids[..., jnp.newaxis] < num_classes, embs, jnp.nan)
  if scale_sqrt_depth:
    embs = embs * emb_var.shape[-1] ** 0.5
  return embs


def sinusoidal_positional_embedding(
    seq_length: int,
    embedding_dim: int,
    *,
    min_timescale: int = 1,
    max_timescale: int = 10_000,
    dtype=jnp.float32,
) -> Array:
  """[1, L, D] sinusoidal table: ``concat([sin, cos])`` over geometric
  timescales.

  Computed in fp32 then cast (the fp32 trig is load-bearing for 1e-4 parity).
  Reference: ``PositionalEmbedding`` videoprism/encoders.py:240-266.
  """
  position = jnp.arange(seq_length, dtype=jnp.float32)[jnp.newaxis, :]
  num_timescales = embedding_dim // 2
  log_timescale_increment = math.log(
      float(max_timescale) / float(min_timescale)
  ) / jnp.maximum(jnp.asarray(num_timescales, dtype=jnp.float32) - 1, 1)
  inv_timescales = min_timescale * jnp.exp(
      jnp.arange(num_timescales, dtype=jnp.float32) * -log_timescale_increment
  )
  scaled_time = (
      position[:, :, jnp.newaxis] * inv_timescales[jnp.newaxis, jnp.newaxis, :]
  )
  embs = jnp.concatenate(
      [jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=-1
  ).astype(dtype)
  embs = jnp.pad(embs, [[0, 0], [0, 0], [0, np.mod(embedding_dim, 2)]])
  return embs


def trainable_positional_embedding(
    params: Params,
    seq_length: int,
    *,
    lookup_style: str = 'matmul',
    dtype=jnp.float32,
) -> Array:
  """[1, L, D] learned positional table lookup; params ``{'emb_var': [Lmax, D]}``.

  The reference looks positions ``0..L-1`` up via a one-hot **matmul**
  (videoprism/encoders.py:282-307).  That is not just a stylistic choice:
  under JAX's DEFAULT matmul precision the product rounds the fp32 table
  through bfloat16 (~2e-3 per entry), and the public checkpoints were
  trained with that rounding in the graph.  ``lookup_style='matmul'`` (the
  parity default) reproduces it exactly; ``'index'`` takes the cheaper exact
  slice for users who prefer accuracy over bit-parity.
  """
  pos_emb_var = basic.cast_floating(params['emb_var'], dtype)
  pos_emb_var = jax.lax.slice_in_dim(pos_emb_var, 0, seq_length, axis=0)
  if lookup_style == 'matmul':
    position = jnp.arange(seq_length, dtype=jnp.int32)[jnp.newaxis, :]
    one_hot_ids = jax.nn.one_hot(position, seq_length, dtype=dtype)
    return jnp.einsum('...y,yz->...z', one_hot_ids, pos_emb_var)
  elif lookup_style == 'index':
    return pos_emb_var[jnp.newaxis, :, :]
  raise ValueError(f'Unknown lookup style: `{lookup_style}`.')


def interpolate_emb_1d(emb: Array, target_emb_length: int) -> Array:
  """Bilinear 1-D resize of a [1, N, D] pos-emb to [1, target, D].

  Reference: videoprism/encoders.py:107-128.
  """
  if len(emb.shape) > 3 or emb.shape[0] != 1:
    raise ValueError('The shape of the embedding should be (1, N, D)')
  emb_dim = emb.shape[-1]
  emb = jnp.squeeze(emb, axis=0)
  target_emb = jax.image.resize(
      emb, (target_emb_length, emb_dim), method='bilinear'
  )
  return jnp.reshape(target_emb, (1, target_emb_length, emb_dim))


def interpolate_emb_2d(
    emb: Array,
    source_emb_shape: tuple[int, int],
    target_emb_shape: tuple[int, int],
) -> Array:
  """Bilinear 2-D resize of a flattened [1, H1*W1, D] pos-emb grid.

  Reference: videoprism/encoders.py:131-165.
  """
  if len(emb.shape) > 3 or emb.shape[0] != 1:
    raise ValueError('The shape of the embedding should be (1, H * W, D)')
  if emb.shape[-2] != source_emb_shape[0] * source_emb_shape[1]:
    raise ValueError('The shape of the embedding does NOT match input specs.')

  emb_dim = emb.shape[-1]
  emb = jnp.reshape(emb, (source_emb_shape[0], source_emb_shape[1], emb_dim))
  target_emb = jax.image.resize(
      emb, (target_emb_shape[0], target_emb_shape[1], emb_dim),
      method='bilinear',
  )
  return jnp.reshape(
      target_emb, (1, target_emb_shape[0] * target_emb_shape[1], emb_dim)
  )


def image_to_patch(inputs: Array, patch_size: int) -> Array:
  """[..., H, W, C] -> [..., H*W/P^2, P^2*C] non-overlapping square patches.

  Pure reshape/transpose — XLA fuses this into the consumer matmul's input
  layout.  Reference: videoprism/encoders.py:70-104 (einops
  ``'... (m p)(n q) c -> ... (m n)(p q c)'``).
  """
  if len(inputs.shape) < 4:
    raise ValueError(
        f'Image should be formatted as 4D [B, H, W, C], Shape: {inputs.shape}'
    )
  height, width, channels = inputs.shape[-3:]
  if height % patch_size != 0 or width % patch_size != 0:
    raise ValueError(
        f'Image height ({height}) and width ({width}) should be multiples '
        f'of patch_size ({patch_size}).'
    )
  m = height // patch_size
  n = width // patch_size
  batch = inputs.shape[:-3]
  x = jnp.reshape(
      inputs, batch + (m, patch_size, n, patch_size, channels))
  # (..., m, p, n, q, c) -> (..., m, n, p, q, c)
  ndim_batch = len(batch)
  perm = tuple(range(ndim_batch)) + tuple(
      ndim_batch + i for i in (0, 2, 1, 3, 4))
  x = jnp.transpose(x, perm)
  return jnp.reshape(
      x, batch + (m * n, patch_size * patch_size * channels))
