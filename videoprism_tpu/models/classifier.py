"""Video classifier: factorized encoder backbone + attention pooling + head.

Functional re-implementation of the reference ``FactorizedVideoClassifier``
(videoprism/encoders.py:583-653).  Note: this follows the *Flax* ground
truth — the reference's MLX port diverges by disabling the pooler layer norm
and per-dim scale (reference videoprism/encoders_mlx.py:960-969), which is a
documented port bug we deliberately do not reproduce.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Collection
from typing import Any

import jax
import jax.numpy as jnp

from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.ops import basic
from videoprism_tpu.ops.transformer import atten_token_pooling

Array = jax.Array
Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VideoClassifierConfig:
  encoder: fe.FactorizedEncoderConfig = fe.FactorizedEncoderConfig()
  num_classes: int = 0

  @property
  def dtype(self):
    return self.encoder.dtype


def apply(
    params: Params,
    inputs: Array,
    cfg: VideoClassifierConfig,
    *,
    train: bool = False,
    return_intermediate: bool | Collection[str] = False,
    frame_paddings: Array | None = None,
    rng: jax.Array | None = None,
) -> tuple[Array, dict[str, Array]]:
  """Video [B, T, H, W, 3] -> logits [B, num_classes].

  Param tree: ``{'encoder': ..., 'atten_pooler': ..., 'projection': ...}``
  (reference videoprism/encoders.py:619-653).
  """
  dtype = cfg.dtype
  enc_rng = None
  if rng is not None:
    rng, enc_rng = jax.random.split(rng)

  features, outputs = fe.apply(
      params['encoder'], inputs, cfg.encoder,
      train=train, return_intermediate=return_intermediate,
      frame_paddings=frame_paddings, rng=enc_rng)
  if fe.contains(return_intermediate, 'spatiotemporal_features'):
    outputs['spatiotemporal_features'] = features

  # Pooler: hidden = model_dim, heads = encoder heads, defaults otherwise
  # (layer norm ON, per-dim scale ON) — reference videoprism/encoders.py:633-640.
  embeddings = atten_token_pooling(
      params['atten_pooler'], features, None,
      num_heads=cfg.encoder.num_heads,
      hidden_dim=cfg.encoder.model_dim,
      num_queries=1, train=train, dtype=dtype,
      tp_axis=cfg.encoder.tp_axis,
      interpret=cfg.encoder.kernel_interpret)
  embeddings = jnp.squeeze(embeddings, axis=-2)

  if fe.contains(return_intermediate, 'global_embeddings'):
    outputs['global_embeddings'] = embeddings

  logits = basic.feed_forward(
      params['projection'], embeddings, activation='identity', dtype=dtype)
  return logits, outputs
