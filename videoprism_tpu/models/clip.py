"""Dual-tower video-text CLIP with a factorized vision encoder.

Functional re-implementation of the reference ``FactorizedVideoCLIP``
(videoprism/encoders.py:762-910): factorized vision tower -> optional
auxiliary full-sequence ViT -> 1-query attention pooler -> l2-normalize;
text tower -> last (class) token -> l2-normalize.  Either modality can be
skipped by passing ``None``.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Collection
from typing import Any

import jax
import jax.numpy as jnp

from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import text_encoder as te
from videoprism_tpu.ops import basic
from videoprism_tpu.ops.transformer import atten_token_pooling

Array = jax.Array
Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VideoCLIPConfig:
  """Field defaults mirror reference videoprism/encoders.py:765-781."""

  # Vision parameters.
  patch_size: int = 18
  pos_emb_shape: tuple[int, int, int] = (16, 16, 16)
  num_spatial_layers: int = 12
  num_temporal_layers: int = 4
  mlp_dim: int = 3072
  num_auxiliary_layers: int = 0
  # Text parameters.
  vocabulary_size: int = 128
  enable_causal_atten: bool = True
  num_unimodal_layers: int = 12
  norm_policy: str = 'pre'
  # Shared parameters.
  model_dim: int = 768
  num_heads: int = 12
  atten_logit_cap: float = 0.0
  scan: bool = True
  # TPU-runtime knobs.
  remat: bool = False
  attention_impl: str = 'xla'
  dtype: Any = jnp.float32
  tp_axis: str | None = None       # manual TP inside a shard_map
  kernel_interpret: bool = False

  def vision_config(self) -> fe.FactorizedEncoderConfig:
    """The vision tower always uses pre-norm (reference
    videoprism/encoders.py:832)."""
    return fe.FactorizedEncoderConfig(
        patch_size=self.patch_size,
        pos_emb_shape=self.pos_emb_shape,
        model_dim=self.model_dim,
        num_spatial_layers=self.num_spatial_layers,
        num_temporal_layers=self.num_temporal_layers,
        num_heads=self.num_heads,
        mlp_dim=self.mlp_dim,
        atten_logit_cap=self.atten_logit_cap,
        norm_policy='pre',
        scan=self.scan,
        remat=self.remat,
        attention_impl=self.attention_impl,
        dtype=self.dtype,
        tp_axis=self.tp_axis,
        kernel_interpret=self.kernel_interpret,
    )

  def text_config(self) -> te.TextEncoderConfig:
    """Text tower with one class token and mlp = 4*D (reference
    videoprism/encoders.py:889-903)."""
    return te.TextEncoderConfig(
        vocabulary_size=self.vocabulary_size,
        num_class_tokens=1,
        enable_causal_atten=self.enable_causal_atten,
        model_dim=self.model_dim,
        num_layers=self.num_unimodal_layers,
        num_heads=self.num_heads,
        mlp_dim=self.model_dim * 4,
        atten_logit_cap=self.atten_logit_cap,
        norm_policy=self.norm_policy,
        scan=self.scan,
        remat=self.remat,
        attention_impl=self.attention_impl,
        dtype=self.dtype,
        tp_axis=self.tp_axis,
        kernel_interpret=self.kernel_interpret,
    )


def encode_vision(
    params: Params,
    inputs: Array,
    cfg: VideoCLIPConfig,
    *,
    train: bool = False,
    normalize: bool = True,
    return_intermediate: bool | Collection[str] = False,
    frame_paddings: Array | None = None,
    rng: jax.Array | None = None,
    stack_override=None,
) -> tuple[Array, dict[str, Array]]:
  """Vision branch: [B, T, H, W, 3] -> contrastive embeddings [B, D].

  ``stack_override`` is forwarded to the inner FactorizedEncoder (see
  :func:`videoprism_tpu.models.factorized_encoder.apply`) — the hook the
  pipeline-parallel train step uses to stage-shard the spatial stack.

  Reference: videoprism/encoders.py:820-885.
  """
  dtype = cfg.dtype
  outputs = {}
  num_frames = inputs.shape[-4]

  enc_rng = aux_rng = None
  if rng is not None:
    rng, enc_rng, aux_rng = jax.random.split(rng, 3)

  vision_features, vision_outputs = fe.apply(
      params['vision_encoder'], inputs, cfg.vision_config(),
      train=train, return_intermediate=return_intermediate,
      frame_paddings=frame_paddings, rng=enc_rng,
      stack_override=stack_override)
  outputs.update(vision_outputs)
  if fe.contains(return_intermediate, 'spatiotemporal_features'):
    outputs['spatiotemporal_features'] = vision_features

  if cfg.num_auxiliary_layers > 0:
    aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
    vision_features = fe.vision_transformer(
        params['auxiliary_encoder'], vision_features, aux_cfg,
        train=train, rng=aux_rng)

  pool = lambda tokens: atten_token_pooling(
      params['contrastive_vision_pooler'], tokens, None,
      num_heads=cfg.num_heads, hidden_dim=cfg.model_dim * 4,
      num_queries=1, train=train, dtype=dtype,
      tp_axis=cfg.tp_axis, interpret=cfg.kernel_interpret)

  video_embeddings = jnp.squeeze(pool(vision_features), axis=-2)
  if normalize:
    video_embeddings = basic.l2_normalize(video_embeddings, axis=-1)

  if fe.contains(return_intermediate, 'frame_embeddings'):
    b = vision_features.shape[0]
    d = vision_features.shape[-1]
    # b (t n) d -> (b t) n d
    frame_features = vision_features.reshape(b * num_frames, -1, d)
    frame_embeddings = jnp.squeeze(pool(frame_features), axis=-2)
    frame_embeddings = frame_embeddings.reshape(b, num_frames, d)
    if normalize:
      frame_embeddings = basic.l2_normalize(frame_embeddings, axis=-1)
    outputs['frame_embeddings'] = frame_embeddings

  return video_embeddings, outputs


def pool_vision_tokens(
    params: Params,
    vision_features: Array,
    cfg: VideoCLIPConfig,
    *,
    normalize: bool = True,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """Encoder tokens [B, T*N, D] -> contrastive embeddings [B, D].

  The tail of :func:`encode_vision` (auxiliary ViT + attention pooler +
  l2-normalize, reference videoprism/encoders.py:860-880), split out so
  long-video paths can pool CACHED encoder tokens — e.g.
  :func:`videoprism_tpu.streaming.embed_long_video_cached`, where
  overlapping windows share per-frame spatial encodings and only the
  temporal stack + this tail re-run per window.  Keep the op sequence in
  lockstep with encode_vision (parity-tested in
  tests/test_spatial_reuse.py).
  """
  if cfg.num_auxiliary_layers > 0:
    aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
    vision_features = fe.vision_transformer(
        params['auxiliary_encoder'], vision_features, aux_cfg,
        train=train, rng=rng)
  pooled = atten_token_pooling(
      params['contrastive_vision_pooler'], vision_features, None,
      num_heads=cfg.num_heads, hidden_dim=cfg.model_dim * 4,
      num_queries=1, train=train, dtype=cfg.dtype,
      tp_axis=cfg.tp_axis, interpret=cfg.kernel_interpret)
  video_embeddings = jnp.squeeze(pooled, axis=-2)
  if normalize:
    video_embeddings = basic.l2_normalize(video_embeddings, axis=-1)
  return video_embeddings


def frame_embeddings_from_tokens(
    params: Params,
    vision_features: Array,
    cfg: VideoCLIPConfig,
    *,
    num_frames: int,
    normalize: bool = True,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """Encoder tokens [B, T*N, D] -> per-frame embeddings [B, T, D].

  The ``frame_embeddings`` tail of :func:`encode_vision` (reference
  encoders.py:874-885): auxiliary ViT over the full token sequence, then
  the contrastive pooler applied per FRAME group — rows live in the text
  tower's space, the input :func:`videoprism_tpu.retrieval.localize_moments`
  consumes.  Split out so long-video localization
  (:func:`videoprism_tpu.streaming.frame_embeddings_long`) can feed
  cached windowed encoder tokens.
  """
  if cfg.num_auxiliary_layers > 0:
    aux_cfg = cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers)
    vision_features = fe.vision_transformer(
        params['auxiliary_encoder'], vision_features, aux_cfg,
        train=train, rng=rng)
  b = vision_features.shape[0]
  d = vision_features.shape[-1]
  # b (t n) d -> (b t) n d.
  frame_features = vision_features.reshape(b * num_frames, -1, d)
  pooled = atten_token_pooling(
      params['contrastive_vision_pooler'], frame_features, None,
      num_heads=cfg.num_heads, hidden_dim=cfg.model_dim * 4,
      num_queries=1, train=train, dtype=cfg.dtype,
      tp_axis=cfg.tp_axis, interpret=cfg.kernel_interpret)
  frame_embeddings = jnp.squeeze(pooled, axis=-2).reshape(
      b, num_frames, d)
  if normalize:
    frame_embeddings = basic.l2_normalize(frame_embeddings, axis=-1)
  return frame_embeddings


def encode_text(
    params: Params,
    text_token_ids: Array,
    text_paddings: Array,
    cfg: VideoCLIPConfig,
    *,
    train: bool = False,
    normalize: bool = True,
    rng: jax.Array | None = None,
) -> Array:
  """Text branch: ids [B, L] -> contrastive embeddings [B, D].

  The last (class) token is the text embedding (reference
  videoprism/encoders.py:887-908).
  """
  text_features = te.apply(
      params['text_encoder'], text_token_ids, text_paddings,
      cfg.text_config(), train=train, rng=rng)
  text_embeddings = text_features[:, -1]
  if normalize:
    text_embeddings = basic.l2_normalize(text_embeddings, axis=-1)
  return text_embeddings


def apply(
    params: Params,
    inputs: Array | None = None,
    text_token_ids: Array | None = None,
    text_paddings: Array | None = None,
    cfg: VideoCLIPConfig = VideoCLIPConfig(),
    *,
    train: bool = False,
    normalize: bool = True,
    return_intermediate: bool | Collection[str] = False,
    frame_paddings: Array | None = None,
    rng: jax.Array | None = None,
    stack_override=None,
) -> tuple[Array | None, Array | None, dict[str, Array]]:
  """Full CLIP forward; either modality may be ``None``.

  Reference: ``FactorizedVideoCLIP.__call__`` videoprism/encoders.py:783-910.
  """
  video_embeddings, text_embeddings, outputs = None, None, {}

  vis_rng = txt_rng = None
  if rng is not None:
    vis_rng, txt_rng = jax.random.split(rng)

  if inputs is not None:
    video_embeddings, outputs = encode_vision(
        params, inputs, cfg, train=train, normalize=normalize,
        return_intermediate=return_intermediate,
        frame_paddings=frame_paddings, rng=vis_rng,
        stack_override=stack_override)

  if text_token_ids is not None:
    assert text_paddings is not None, 'Text paddings are required.'
    text_embeddings = encode_text(
        params, text_token_ids, text_paddings, cfg,
        train=train, normalize=normalize, rng=txt_rng)

  return video_embeddings, text_embeddings, outputs
