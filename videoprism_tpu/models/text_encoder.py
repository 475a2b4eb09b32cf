"""CoCa-style causal text encoder.

Functional re-implementation of the reference ``TextEncoder``
(videoprism/encoders.py:656-759): sinusoidal pos-emb + sqrt(D)-scaled token
embedding, optional appended learned class tokens (also sqrt(D)-scaled), a
causal relu transformer stack, and a final layer norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from videoprism_tpu.ops import basic
from videoprism_tpu.ops import embeddings as emb_lib
from videoprism_tpu.ops.transformer import (
    TransformerLayerConfig,
    stacked_transformer,
)

Array = jax.Array
Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
  """Field defaults mirror reference videoprism/encoders.py:680-690."""

  vocabulary_size: int = 128
  num_class_tokens: int = 0
  enable_causal_atten: bool = True
  model_dim: int = 768
  num_layers: int = 12
  mlp_dim: int = 3072
  num_heads: int = 12
  atten_logit_cap: float = 0.0
  norm_policy: str = 'pre'
  enable_per_dim_scale: bool = False
  scan: bool = True
  remat: bool = False
  attention_impl: str = 'xla'
  dtype: Any = jnp.float32
  tp_axis: str | None = None       # manual TP inside a shard_map
  kernel_interpret: bool = False

  def layer_config(self) -> TransformerLayerConfig:
    """Causal relu stack (reference videoprism/encoders.py:742-755)."""
    return TransformerLayerConfig(
        num_layers=self.num_layers,
        hidden_dim=self.mlp_dim,
        num_heads=self.num_heads,
        norm_policy=self.norm_policy,
        activation='relu',
        enable_per_dim_scale=self.enable_per_dim_scale,
        logit_cap=self.atten_logit_cap,
        enable_causal_atten=self.enable_causal_atten,
        scan=self.scan,
        remat=self.remat,
        attention_impl=self.attention_impl,
        dtype=self.dtype,
        tp_axis=self.tp_axis,
        kernel_interpret=self.kernel_interpret,
    )


def apply(
    params: Params,
    inputs: Array,
    paddings: Array,
    cfg: TextEncoderConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """Token ids [B, L] + paddings [B, L] -> features [B, L(+cls), D].

  Reference: ``TextEncoder.__call__`` videoprism/encoders.py:692-759.
  """
  dtype = cfg.dtype
  batch_size, seq_length = inputs.shape

  pos_emb = emb_lib.sinusoidal_positional_embedding(
      seq_length, cfg.model_dim, dtype=dtype)
  input_emb = emb_lib.token_embedding(
      params['token_emb'], inputs,
      num_classes=cfg.vocabulary_size, scale_sqrt_depth=True, dtype=dtype)
  features = input_emb + pos_emb

  if cfg.num_class_tokens > 0:
    cls_emb = basic.cast_floating(params['cls_emb'], dtype)
    cls_emb = jnp.tile(cls_emb, [batch_size, 1, 1])
    cls_emb = cls_emb * cfg.model_dim**0.5
    features = jnp.concatenate([features, cls_emb], axis=-2)

    cls_paddings = jnp.zeros(
        [batch_size, cfg.num_class_tokens], dtype=paddings.dtype)
    paddings = jnp.concatenate([paddings, cls_paddings], axis=-1)

  features = stacked_transformer(
      params['unimodal_transformer'], features, paddings,
      cfg.layer_config(), train=train, rng=rng)
  features = basic.layer_norm(params['unimodal_ln'], features, dtype=dtype)
  return features
