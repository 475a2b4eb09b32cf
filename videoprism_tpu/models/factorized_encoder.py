"""ViViT model-2 factorized space-time video encoder.

Functional re-implementation of the reference ``FactorizedEncoder``
(videoprism/encoders.py:391-580) and its ``VisionTransformer`` wrapper
(videoprism/encoders.py:310-388).

Pipeline for ``[B, T, H, W, 3]`` input (P = patch size, N = H*W/P^2 tokens):

    patches [B*T, N, P^2*3]
      -> linear ``patch_projection``                  [B*T, N, D]
      -> + learned spatial pos-emb (bilinear-resized if grid differs)
      -> spatial transformer stack (gelu, soft-capped attention)
      -> ``spatial_ln``
      -> regroup (b t) n d -> (b n) t d
      -> + learned temporal pos-emb (1-D resized if T differs)
      -> temporal transformer stack
      -> ``temporal_ln``
      -> regroup (b n) t d -> b (t n) d                [B, T*N, D]

The factorization is what makes this TPU-friendly at scale: attention is
always over 256 (spatial) or T<=16 (temporal) tokens — big batched MXU
matmuls, never a 4096-token quadratic.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Collection
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from videoprism_tpu.ops import basic
from videoprism_tpu.ops import embeddings as emb_lib
from videoprism_tpu.ops.transformer import (
    TransformerLayerConfig,
    stacked_transformer,
)

Array = jax.Array
Params = dict[str, Any]


def contains(collection: Collection[str] | bool, key: str) -> bool:
  """True if ``collection`` is True or contains ``key``.

  Reference: videoprism/encoders.py:36-47.
  """
  return collection if isinstance(collection, bool) else key in collection


@dataclasses.dataclass(frozen=True)
class FactorizedEncoderConfig:
  """Static config; field defaults mirror reference videoprism/encoders.py:400-409."""

  patch_size: int = 18
  pos_emb_shape: tuple[int, int, int] = (16, 16, 16)
  model_dim: int = 768
  num_spatial_layers: int = 12
  num_temporal_layers: int = 4
  num_heads: int = 12
  mlp_dim: int = 3072
  atten_logit_cap: float = 0.0
  norm_policy: str = 'pre'
  scan: bool = True
  # TPU-runtime knobs (not part of the reference architecture):
  remat: bool = False
  attention_impl: str = 'xla'
  dtype: Any = jnp.float32
  tp_axis: str | None = None       # manual TP inside a shard_map (tp.py)
  kernel_interpret: bool = False   # Pallas interpret mode (CPU mesh tests)

  def vit_layer_config(self, num_layers: int) -> TransformerLayerConfig:
    """ViT stack config: gelu, per-dim-scale off, non-causal.

    Reference: ``VisionTransformer.__call__`` videoprism/encoders.py:369-387.
    """
    return TransformerLayerConfig(
        num_layers=num_layers,
        hidden_dim=self.mlp_dim,
        num_heads=self.num_heads,
        norm_policy=self.norm_policy,
        activation='gelu',
        enable_per_dim_scale=False,
        logit_cap=self.atten_logit_cap,
        enable_causal_atten=False,
        scan=self.scan,
        remat=self.remat,
        attention_impl=self.attention_impl,
        dtype=self.dtype,
        tp_axis=self.tp_axis,
        kernel_interpret=self.kernel_interpret,
    )


def vision_transformer(
    params: Params,
    inputs: Array,
    cfg: TransformerLayerConfig,
    *,
    paddings: Array | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """ViT = StackedTransformer under the ``transformers_stack`` key.

  Reference: videoprism/encoders.py:350-388.
  """
  if paddings is None:
    paddings = jnp.zeros(inputs.shape[:-1], dtype=inputs.dtype)
  return stacked_transformer(
      params['transformers_stack'], inputs, paddings, cfg,
      train=train, rng=rng)


def _embed_patches(
    params: Params,
    inputs: Array,
    cfg: FactorizedEncoderConfig,
) -> tuple[Array, bool]:
  """Video [B, T, H, W, 3] -> patch tokens [B*T, N, ...].

  Returns ``(patches, projected)``: ``projected=True`` means the patch
  projection already ran (the conv fast path below) and ``patches`` is
  [B*T, N, D]; ``False`` means raw patch pixels [B*T, N, P^2*C] that
  still need the ``patch_projection`` dense layer.

  Perf mode (flash): patch extraction + projection as one strided conv —
  the MXU's implicit-GEMM conv skips the explicit [B*T, N, P^2*C] patch
  transpose entirely (measured 4.8 vs 6.0 ms at b32).  The weight is the
  same checkpoint tensor reshaped to [P, P, C, D] (row-major (p1, p2, c)
  matches image_to_patch's flattening order), so outputs agree to bf16
  rounding.  'xla' keeps the reference-exact rearrange+matmul path.
  """
  b, t, h, w, c = inputs.shape
  # Cast before patch extraction: the patching is a pure permutation, so
  # bf16-first is value-identical but halves the transpose's HBM traffic.
  inputs = inputs.astype(cfg.dtype)
  reshaped_inputs = inputs.reshape(b * t, h, w, c)

  if cfg.attention_impl == 'flash':
    pw = basic.cast_floating(
        params['patch_projection']['linear']['kernel'], cfg.dtype)
    pb = basic.cast_floating(
        params['patch_projection']['linear']['bias'], cfg.dtype)
    p = cfg.patch_size
    # No preferred_element_type: the MXU accumulates fp32 internally and
    # rounds to the operand dtype, matching the dense path's rounding —
    # and conv's gradient transpose rule rejects mixed operand/cotangent
    # dtypes that a fp32 preferred output would create under training.
    out = jax.lax.conv_general_dilated(
        reshaped_inputs, pw.reshape(p, p, c, pw.shape[-1]),
        window_strides=(p, p), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    num_patches = out.shape[1] * out.shape[2]
    return (out + pb).reshape(b * t, num_patches, pw.shape[-1]), True
  return emb_lib.image_to_patch(reshaped_inputs, cfg.patch_size), False


def apply(
    params: Params,
    inputs: Array,
    cfg: FactorizedEncoderConfig,
    *,
    train: bool = False,
    return_intermediate: bool | Collection[str] = False,
    frame_paddings: Array | None = None,
    rng: jax.Array | None = None,
    stack_override=None,
) -> tuple[Array, dict[str, Array]]:
  """Video [B, T, H, W, 3] -> embeddings [B, T*N, D] (+ intermediates).

  ``stack_override``: optional hook
  ``(name, stack_params, inputs, stack_cfg, paddings) -> Array | None``
  replacing a transformer stack's forward (``name`` is
  ``'spatial_encoder'`` / ``'temporal_encoder'``); returning ``None``
  falls through to the default.  Used by
  :func:`videoprism_tpu.parallel.pp.make_pp_encoder_forward` to pipeline
  a stack's layers across mesh stages.

  Reference: ``FactorizedEncoder.__call__`` videoprism/encoders.py:411-456.
  """
  b, t, h, w, c = inputs.shape
  assert h == w
  patches, projected = _embed_patches(params, inputs, cfg)

  patches_paddings = None
  if frame_paddings is not None:
    assert frame_paddings.shape == (b, t)
    reshaped_frame_paddings = frame_paddings.reshape(b * t)
    num_patches = patches.shape[1]
    patches_paddings = jnp.repeat(
        reshaped_frame_paddings[:, jnp.newaxis], num_patches, axis=-1)

  return encode_with_patches(
      params,
      patches,
      image_shape=(t, h, w),
      cfg=cfg,
      train=train,
      return_intermediate=return_intermediate,
      patches_paddings=patches_paddings,
      rng=rng,
      _projected=projected,
      stack_override=stack_override,
  )


def encode_with_patches(
    params: Params,
    patches: Array,
    image_shape: tuple[int, int, int],
    cfg: FactorizedEncoderConfig,
    *,
    train: bool = False,
    return_intermediate: bool | Collection[str] = False,
    patches_paddings: Array | None = None,
    rng: jax.Array | None = None,
    _projected: bool = False,
    stack_override=None,
) -> tuple[Array, dict[str, Array]]:
  """Patches [B*T, N, P^2*C] -> embeddings [B, T*N, D].

  ``_projected``: internal fast path — ``patches`` already went through
  the patch projection (the conv embed in :func:`apply`).

  Reference: ``FactorizedEncoder.encode_with_patches``
  videoprism/encoders.py:458-580.
  """
  dtype = cfg.dtype
  t, h, w = image_shape
  b = patches.shape[0] // t

  spatial_rng = temporal_rng = None
  if rng is not None:
    rng, spatial_rng, temporal_rng = jax.random.split(rng, 3)

  # Cast activations into the fprop dtype up front: without this, fp32
  # video inputs promote every matmul back to fp32 even with bf16 params,
  # silently forfeiting the MXU bf16 rate.
  patches = patches.astype(dtype)

  if not _projected:
    patches = basic.feed_forward(
        params['patch_projection'], patches,
        activation='identity', dtype=dtype)  # (B*T, N, D)

  # Spatial positional embedding (+ 2-D bilinear resize if the patch grid
  # differs from the checkpoint grid).
  spatial_pos_emb_shape = cfg.pos_emb_shape[-2:]
  spatial_seq_length = int(np.prod(spatial_pos_emb_shape))
  spatial_pos_emb = emb_lib.trainable_positional_embedding(
      params['spatial_pos_emb'], spatial_seq_length, dtype=dtype)
  num_row_patches = h // cfg.patch_size
  num_col_patches = w // cfg.patch_size
  if spatial_pos_emb_shape != (num_row_patches, num_col_patches):
    spatial_pos_emb = emb_lib.interpolate_emb_2d(
        spatial_pos_emb, spatial_pos_emb_shape,
        (num_row_patches, num_col_patches))
  patches = patches + spatial_pos_emb

  spatial_cfg = cfg.vit_layer_config(cfg.num_spatial_layers)
  features = None
  if stack_override is not None:
    features = stack_override(
        'spatial_encoder', params['spatial_encoder'], patches,
        spatial_cfg, patches_paddings)
  if features is None:
    features = vision_transformer(
        params['spatial_encoder'], patches, spatial_cfg,
        paddings=patches_paddings, train=train, rng=spatial_rng)

  n = features.shape[1]
  d = features.shape[2]

  # Fused boundary path (flash impl): each inter-stack boundary
  # (LN + regroup transpose + pos-emb add) is one Pallas pass — one HBM
  # read + one write instead of ~3 round trips (the LN kernel is opaque
  # to XLA, so the transpose can't fuse into it).  See ops/pallas/boundary.
  from videoprism_tpu.ops.pallas import boundary as boundary_lib

  use_boundary = (
      cfg.attention_impl == 'flash'
      and (cfg.kernel_interpret or jax.default_backend() == 'tpu')
      and boundary_lib.boundary_supported(n, t, d, jnp.dtype(dtype).itemsize)
      and not contains(return_intermediate, 'spatial_features'))

  temporal_paddings = None
  if patches_paddings is not None:
    temporal_paddings = (
        patches_paddings.reshape(b, t, n)
        .transpose(0, 2, 1)
        .reshape(b * n, t)
    )

  # Temporal positional embedding (+ 1-D resize for arbitrary frame counts).
  temporal_seq_length = cfg.pos_emb_shape[0]
  temporal_pos_emb = emb_lib.trainable_positional_embedding(
      params['temporal_pos_emb'], temporal_seq_length, dtype=dtype)
  if temporal_seq_length != t:
    temporal_pos_emb = emb_lib.interpolate_emb_1d(temporal_pos_emb, t)

  spatial_features = None
  if use_boundary:
    st = boundary_lib.spatial_to_temporal_vjp(
        b, t, interpret=cfg.kernel_interpret)
    features = st(
        features,
        basic.cast_floating(params['spatial_ln']['scale'], dtype),
        basic.cast_floating(params['spatial_ln']['bias'], dtype),
        temporal_pos_emb)
  else:
    features = basic.layer_norm(params['spatial_ln'], features, dtype=dtype)
    spatial_features = features
    # Regroup to per-token temporal sequences: (b t) n d -> (b n) t d.
    features = features.reshape(b, t, n, d).transpose(0, 2, 1, 3)
    features = features.reshape(b * n, t, d)
    features = features + temporal_pos_emb

  temporal_cfg = cfg.vit_layer_config(cfg.num_temporal_layers)
  temporal_out = None
  if stack_override is not None:
    temporal_out = stack_override(
        'temporal_encoder', params['temporal_encoder'], features,
        temporal_cfg, temporal_paddings)
  features = temporal_out if temporal_out is not None else (
      vision_transformer(
          params['temporal_encoder'], features, temporal_cfg,
          paddings=temporal_paddings, train=train, rng=temporal_rng))
  if use_boundary:
    ts = boundary_lib.temporal_to_output_vjp(
        b, n, interpret=cfg.kernel_interpret)
    features = ts(
        features,
        basic.cast_floating(params['temporal_ln']['scale'], dtype),
        basic.cast_floating(params['temporal_ln']['bias'], dtype))
  else:
    features = basic.layer_norm(
        params['temporal_ln'], features, dtype=dtype)
    # (b n) t d -> b (t n) d.
    features = features.reshape(b, n, t, d).transpose(0, 2, 1, 3)
    features = features.reshape(b, t * n, d)

  outputs = {}
  if contains(return_intermediate, 'spatial_features'):
    outputs['spatial_features'] = (
        spatial_features.reshape(b, t, n, d).reshape(b, t * n, d)
    )
  return features, outputs


def encode_spatial(
    params: Params,
    inputs: Array,
    cfg: FactorizedEncoderConfig,
    *,
    frame_paddings: Array | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """Spatial half only: video [B, T, H, W, 3] -> per-frame features
  [B, T, N, D] (post ``spatial_ln``, pre temporal pos-emb).

  The factorized architecture (reference videoprism/encoders.py:458-529)
  runs everything up to the spatial LayerNorm independently per frame —
  no cross-frame mixing happens until the temporal pos-emb add.  That
  makes per-frame spatial features CACHEABLE: overlapping temporal
  windows of a long video (``stride < window`` in
  :mod:`videoprism_tpu.streaming`) can encode each frame's spatial tokens
  once and re-run only the (much smaller) temporal stack per window.

  ``encode_temporal(params, encode_spatial(params, x, cfg), cfg)``
  equals ``apply(params, x, cfg)[0]`` exactly on the ``'xla'`` path; the
  ``'flash'`` path differs only in the fused boundary kernel's rounding
  (the split crosses the spatial_ln+regroup+pos-emb fusion seam, so the
  split path applies them as separate ops).
  """
  dtype = cfg.dtype
  b, t, h, w, c = inputs.shape
  assert h == w
  patches, projected = _embed_patches(params, inputs, cfg)
  patches = patches.astype(dtype)
  if not projected:
    patches = basic.feed_forward(
        params['patch_projection'], patches,
        activation='identity', dtype=dtype)  # (B*T, N, D)

  patches_paddings = None
  if frame_paddings is not None:
    assert frame_paddings.shape == (b, t)
    patches_paddings = jnp.repeat(
        frame_paddings.reshape(b * t)[:, jnp.newaxis],
        patches.shape[1], axis=-1)

  spatial_pos_emb_shape = cfg.pos_emb_shape[-2:]
  spatial_seq_length = int(np.prod(spatial_pos_emb_shape))
  spatial_pos_emb = emb_lib.trainable_positional_embedding(
      params['spatial_pos_emb'], spatial_seq_length, dtype=dtype)
  num_row_patches = h // cfg.patch_size
  num_col_patches = w // cfg.patch_size
  if spatial_pos_emb_shape != (num_row_patches, num_col_patches):
    spatial_pos_emb = emb_lib.interpolate_emb_2d(
        spatial_pos_emb, spatial_pos_emb_shape,
        (num_row_patches, num_col_patches))
  patches = patches + spatial_pos_emb

  features = vision_transformer(
      params['spatial_encoder'], patches,
      cfg.vit_layer_config(cfg.num_spatial_layers),
      paddings=patches_paddings, train=train, rng=rng)
  features = basic.layer_norm(params['spatial_ln'], features, dtype=dtype)
  n, d = features.shape[1], features.shape[2]
  return features.reshape(b, t, n, d)


def encode_temporal(
    params: Params,
    spatial_features: Array,
    cfg: FactorizedEncoderConfig,
    *,
    frame_paddings: Array | None = None,
    train: bool = False,
    rng: jax.Array | None = None,
) -> Array:
  """Temporal half only: per-frame spatial features [B, T, N, D] (from
  :func:`encode_spatial`) -> embeddings [B, T*N, D].

  Applies temporal pos-emb (1-D resized for arbitrary T), the temporal
  transformer stack, ``temporal_ln``, and the output regroup — the exact
  tail of :func:`encode_with_patches` (reference
  videoprism/encoders.py:530-580).
  """
  dtype = cfg.dtype
  b, t, n, d = spatial_features.shape
  features = spatial_features.astype(dtype)
  # Regroup to per-token temporal sequences: b t n d -> (b n) t d.
  features = features.transpose(0, 2, 1, 3).reshape(b * n, t, d)

  temporal_seq_length = cfg.pos_emb_shape[0]
  temporal_pos_emb = emb_lib.trainable_positional_embedding(
      params['temporal_pos_emb'], temporal_seq_length, dtype=dtype)
  if temporal_seq_length != t:
    temporal_pos_emb = emb_lib.interpolate_emb_1d(temporal_pos_emb, t)
  features = features + temporal_pos_emb

  temporal_paddings = None
  if frame_paddings is not None:
    assert frame_paddings.shape == (b, t)
    temporal_paddings = jnp.repeat(
        frame_paddings[:, jnp.newaxis, :], n, axis=1).reshape(b * n, t)

  features = vision_transformer(
      params['temporal_encoder'], features,
      cfg.vit_layer_config(cfg.num_temporal_layers),
      paddings=temporal_paddings, train=train, rng=rng)
  features = basic.layer_norm(
      params['temporal_ln'], features, dtype=dtype)
  # (b n) t d -> b (t n) d.
  features = features.reshape(b, n, t, d).transpose(0, 2, 1, 3)
  return features.reshape(b, t * n, d)
