"""Random parameter-tree construction for all model families.

The trees produced here are *structurally identical* to the public
HuggingFace "repeated" checkpoints (and to ``flax_model.init(...)`` on the
reference modules): same nesting, same leaf names, same shapes — including
the stacked leading layer axis of scanned transformer stacks.  That identity
is what lets checkpoints load with zero renaming and lets the test suite
drive the reference Flax model and this framework with the *same* tree.

Initializer choices mirror flax/reference defaults (lecun_normal kernels,
zeros biases, zeros LN scale under the (scale+1) convention, normal(1/sqrt(D))
token embeddings; reference videoprism/layers.py:30, 248, 518 and
videoprism/encoders.py:202, 728).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from videoprism_tpu.models import classifier as vc
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import text_encoder as te
from videoprism_tpu.ops.transformer import TransformerLayerConfig

Params = dict[str, Any]

_lecun = jax.nn.initializers.lecun_normal()


def _dense(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
  return {
      'linear': {
          'kernel': _lecun(rng, (in_dim, out_dim), dtype),
          'bias': jnp.zeros((out_dim,), dtype),
      }
  }


def _layer_norm(dim: int, dtype=jnp.float32) -> Params:
  # (scale + 1) convention: stored scale starts at 0 (reference
  # videoprism/layers.py:248).
  return {'scale': jnp.zeros((dim,), dtype), 'bias': jnp.zeros((dim,), dtype)}


def _attention(
    rng,
    query_input_dim: int,
    num_heads: int,
    dim_per_head: int,
    *,
    per_dim_scale: bool,
    dtype=jnp.float32,
) -> Params:
  """(D, N, H)-layout MHA params (reference videoprism/layers.py:474-499)."""
  rngs = jax.random.split(rng, 4)
  d, n, h = query_input_dim, num_heads, dim_per_head
  proj = lambda r: {'w': _lecun(r, (d, n, h), dtype),
                    'b': jnp.zeros((n, h), dtype)}
  params = {
      'query': proj(rngs[0]),
      'key': proj(rngs[1]),
      'value': proj(rngs[2]),
      'post': {'w': _lecun(rngs[3], (d, n, h), dtype),
               'b': jnp.zeros((d,), dtype)},
  }
  if per_dim_scale:
    params['per_dim_scale'] = {'per_dim_scale': jnp.zeros((h,), dtype)}
  return params


def _transformer_layer(
    rng, model_dim: int, cfg: TransformerLayerConfig, dtype=jnp.float32
) -> Params:
  rngs = jax.random.split(rng, 4)
  dim_per_head = cfg.dim_per_head or model_dim // cfg.num_heads

  if cfg.norm_policy == 'primer_hybrid':
    attn_lns = {'pre_layer_norm': _layer_norm(model_dim, dtype),
                'post_layer_norm': _layer_norm(model_dim, dtype)}
    ffn_lns = {'pre_layer_norm': _layer_norm(model_dim, dtype),
               'post_layer_norm': _layer_norm(model_dim, dtype)}
  else:
    attn_lns = {'layer_norm': _layer_norm(model_dim, dtype)}
    ffn_lns = {'layer_norm': _layer_norm(model_dim, dtype)}

  return {
      **attn_lns,
      'self_attention': _attention(
          rngs[0], model_dim, cfg.num_heads, dim_per_head,
          per_dim_scale=cfg.enable_per_dim_scale, dtype=dtype),
      'ff_layer': {
          **ffn_lns,
          'ffn_layer1': _dense(rngs[1], model_dim, cfg.hidden_dim, dtype),
          'ffn_layer2': _dense(rngs[2], cfg.hidden_dim, model_dim, dtype),
      },
  }


def _stacked_transformer(
    rng, model_dim: int, cfg: TransformerLayerConfig, dtype=jnp.float32
) -> Params:
  """Stacked (scan) or per-layer transformer params."""
  if cfg.scan:
    layer_rngs = jax.random.split(rng, cfg.num_layers)
    stacked = jax.vmap(
        lambda r: _transformer_layer(r, model_dim, cfg, dtype)
    )(layer_rngs)
    return {'x_layers': stacked}
  out = {}
  for i in range(cfg.num_layers):
    rng, sub = jax.random.split(rng)
    out[f'x_layers_{i}'] = _transformer_layer(sub, model_dim, cfg, dtype)
  return out


def _vision_transformer(
    rng, model_dim: int, cfg: TransformerLayerConfig, dtype=jnp.float32
) -> Params:
  return {'transformers_stack': _stacked_transformer(rng, model_dim, cfg, dtype)}


def _atten_pooling(
    rng,
    input_dim: int,
    hidden_dim: int,
    num_heads: int,
    *,
    num_queries: int = 1,
    add_layer_norm: bool = True,
    per_dim_scale: bool = True,
    dtype=jnp.float32,
) -> Params:
  """Reference videoprism/layers.py:1088-1129."""
  rng_q, rng_a = jax.random.split(rng)
  dim_per_head = hidden_dim // num_heads
  params = {
      'pooling_attention_query': _lecun(
          rng_q, (num_queries, input_dim), dtype),
      'pooling_attention': _attention(
          rng_a, input_dim, num_heads, dim_per_head,
          per_dim_scale=per_dim_scale, dtype=dtype),
  }
  if add_layer_norm:
    params['pooling_attention_layer_norm'] = _layer_norm(input_dim, dtype)
  return params


def init_factorized_encoder(
    rng, cfg: fe.FactorizedEncoderConfig, dtype=jnp.float32
) -> Params:
  """Param tree for ``factorized_encoder.apply``."""
  rngs = jax.random.split(rng, 4)
  patch_dim = cfg.patch_size * cfg.patch_size * 3
  spatial_len = cfg.pos_emb_shape[1] * cfg.pos_emb_shape[2]
  return {
      'patch_projection': _dense(rngs[0], patch_dim, cfg.model_dim, dtype),
      'spatial_pos_emb': {
          'emb_var': _lecun(rngs[1], (spatial_len, cfg.model_dim), dtype)},
      'spatial_encoder': _vision_transformer(
          rngs[2], cfg.model_dim,
          cfg.vit_layer_config(cfg.num_spatial_layers), dtype),
      'spatial_ln': _layer_norm(cfg.model_dim, dtype),
      'temporal_pos_emb': {
          'emb_var': _lecun(
              jax.random.fold_in(rngs[1], 1),
              (cfg.pos_emb_shape[0], cfg.model_dim), dtype)},
      'temporal_encoder': _vision_transformer(
          rngs[3], cfg.model_dim,
          cfg.vit_layer_config(cfg.num_temporal_layers), dtype),
      'temporal_ln': _layer_norm(cfg.model_dim, dtype),
  }


def init_text_encoder(
    rng, cfg: te.TextEncoderConfig, dtype=jnp.float32
) -> Params:
  """Param tree for ``text_encoder.apply``."""
  rngs = jax.random.split(rng, 3)
  d = cfg.model_dim
  emb_init = jax.nn.initializers.normal(stddev=1.0 / d**0.5)
  params = {
      'token_emb': {
          'emb_var': emb_init(rngs[0], (cfg.vocabulary_size, d), dtype)},
      'unimodal_transformer': _stacked_transformer(
          rngs[1], d, cfg.layer_config(), dtype),
      'unimodal_ln': _layer_norm(d, dtype),
  }
  if cfg.num_class_tokens > 0:
    params['cls_emb'] = emb_init(rngs[2], (1, cfg.num_class_tokens, d), dtype)
  return params


def init_video_clip(rng, cfg: vclip.VideoCLIPConfig, dtype=jnp.float32) -> Params:
  """Param tree for ``clip.apply``."""
  rngs = jax.random.split(rng, 4)
  d = cfg.model_dim
  params = {
      'vision_encoder': init_factorized_encoder(
          rngs[0], cfg.vision_config(), dtype),
      'contrastive_vision_pooler': _atten_pooling(
          rngs[1], d, d * 4, cfg.num_heads, dtype=dtype),
      'text_encoder': init_text_encoder(rngs[2], cfg.text_config(), dtype),
  }
  if cfg.num_auxiliary_layers > 0:
    aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
    params['auxiliary_encoder'] = _vision_transformer(rngs[3], d, aux_cfg, dtype)
  return params


def init_video_classifier(
    rng, cfg: vc.VideoClassifierConfig, dtype=jnp.float32
) -> Params:
  """Param tree for ``classifier.apply``."""
  rngs = jax.random.split(rng, 3)
  d = cfg.encoder.model_dim
  return {
      'encoder': init_factorized_encoder(rngs[0], cfg.encoder, dtype),
      'atten_pooler': _atten_pooling(rngs[1], d, d, cfg.encoder.num_heads,
                                     dtype=dtype),
      'projection': _dense(rngs[2], d, cfg.num_classes, dtype),
  }
