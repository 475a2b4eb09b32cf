"""Sequence parallelism for the full-sequence attention stages.

The factorized encoder never attends over the full T*N video sequence —
spatial attention runs on 256-token tiles and temporal attention on
T<=16-token tubes (SURVEY.md par. 2; reference videoprism/encoders.py:516-570).
The ONLY full-sequence attentions in the architecture are

  * the auxiliary ViT: ``num_auxiliary_layers`` transformer layers over all
    T*N tokens (4096 for 16x288^2; reference videoprism/encoders.py:846-856),
  * the 1-query contrastive pooler cross-attention over the same tokens
    (reference videoprism/encoders.py:857-867).

These are exactly the stages whose activation memory and attention FLOPs
grow with video length, and therefore the stages sequence parallelism
targets: long-video inputs (T >> 16) blow past single-chip HBM here first.

Design (all-gather-KV, the Megatron-SP/"Ulysses-lite" recipe, run inside a
``shard_map`` so the Pallas flash kernel stays on the fast path):

  * tokens are sharded [B, T/sp, D] over the mesh's ``model`` axis;
  * per auxiliary layer: LayerNorm, Q projection, FFN and the residual are
    token-local; each device all-gathers the *normed* layer input along T
    (one ``all_gather`` per layer, riding ICI) and computes K/V from the
    gathered sequence while Q stays local.  The flash kernel then runs on
    the rectangular [T/sp, T] geometry it already supports.  Recomputing
    the K/V projections per device trades (2*T*D^2 per-device FLOPs) for
    halving the gather bytes vs gathering K and V separately — on an
    activation-bandwidth-bound chip the gather is the scarce resource.
  * pooler: a distributed online softmax — each device computes the
    1-query logits against only its key shard, then the softmax statistics
    (global row-max via ``pmax``, exp-sum via ``psum``) and the projected
    value partials (``psum``) are combined across the axis.  The pooled
    query never materializes the gathered sequence at all, so pooling a
    video of ANY length needs only O(T/sp) resident tokens.

Numerics match the single-device path exactly up to float summation order:
the distributed row-max equals ``jax.nn.softmax``'s global max-shift, and a
fully-masked row degenerates to the reference's uniform-probs behavior
automatically (all logits share the mask value, so ``exp(logit - max) = 1``
everywhere — the same softmax-of-constants the reference computes).

Composability: the ``model`` mesh axis is *reused* for sequence here — SP
and manual TP are alternative uses of the same axis (Megatron-SP style),
not nested; :func:`make_sp_clip_vision_forward` additionally folds the axis
into data parallelism for the factorized-encoder stage, where clips are
embarrassingly parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from videoprism_tpu.ops import attention as attention_lib
from videoprism_tpu.ops import basic
from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops.transformer import (
    TransformerLayerConfig,
    transformer_ffn,
)
from videoprism_tpu.parallel import mesh as mesh_lib

Array = jax.Array
Params = Any


def _validate_sp_cfg(cfg: TransformerLayerConfig) -> None:
  if cfg.enable_causal_atten:
    raise NotImplementedError(
        'sequence parallelism covers the bidirectional full-sequence stages '
        '(aux ViT / pooler); causal stacks are not sequence-sharded')
  if cfg.norm_policy != 'pre':
    raise NotImplementedError(
        f'sp_stacked_transformer supports norm_policy="pre" (the vision '
        f'tower policy, reference encoders.py:832), got {cfg.norm_policy!r}')
  if cfg.tp_axis is not None:
    raise ValueError(
        'tp_axis and sequence parallelism reuse the same mesh axis — '
        'build the SP stack with tp_axis=None')


def _sp_layer(
    layer_params: Params,
    x: Array,            # [B, T_local, D]
    paddings: Array,     # [B, T_local]
    key_mask: Array,     # [B, 1, 1, T_full] additive
    cfg: TransformerLayerConfig,
    axis: str,
) -> Array:
  """One pre-norm layer with token-sharded activations.

  Same op order as :func:`videoprism_tpu.ops.transformer.transformer_layer`
  (reference videoprism/layers.py:796-872) — only the K/V inputs differ:
  they come from the all-gathered normed sequence.
  """
  dtype = cfg.dtype
  normed = basic.layer_norm(
      layer_params['layer_norm'], x, use_bias=cfg.use_bias, dtype=dtype)
  normed_full = jax.lax.all_gather(normed, axis, axis=1, tiled=True)
  atten = attention_lib.multi_head_attention(
      layer_params['self_attention'],
      normed, normed_full, normed_full, key_mask,
      hidden_dim=x.shape[-1],
      num_heads=cfg.num_heads,
      dim_per_head=cfg.dim_per_head,
      logit_cap=cfg.logit_cap,
      enable_per_dim_scale=cfg.enable_per_dim_scale,
      use_bias=cfg.use_bias,
      dtype=dtype,
      impl=cfg.attention_impl,
      interpret=cfg.kernel_interpret,
  )
  x = atten + x
  return transformer_ffn(
      layer_params['ff_layer'], x, paddings, cfg, train=False)


def sp_stacked_transformer(
    params: Params,
    inputs: Array,             # [B, T_local, D] — token shard
    paddings: Array | None,    # [B, T_local]
    cfg: TransformerLayerConfig,
    *,
    axis: str,
) -> Array:
  """Sequence-parallel transformer stack; call INSIDE a ``shard_map``.

  ``inputs`` is this device's token shard; the return value is the same
  shard of the stack output.  Inference-path only (no dropout state);
  gradients flow through the collectives for completeness.
  """
  _validate_sp_cfg(cfg)
  from videoprism_tpu import quantization

  first = params['x_layers'] if cfg.scan else params['x_layers_0']
  if quantization.is_quantized(first):
    # The SP layer feeds multi_head_attention / transformer_ffn directly,
    # bypassing transformer_layer's int8 dispatch — an int8 tree here
    # would silently compute garbage (no scales applied).
    raise NotImplementedError(
        'sp_stacked_transformer needs floating weights: dequantize the '
        'aux tower for SP serving (its weights are small)')
  if paddings is None:
    paddings = jnp.zeros(inputs.shape[:-1], dtype=inputs.dtype)

  # Key-side mask over the FULL sequence, shared by every layer.
  paddings_full = jax.lax.all_gather(paddings, axis, axis=1, tiled=True)
  key_mask = mask_lib.paddings_to_mask(paddings_full, inputs.dtype)

  if cfg.scan:
    def body(carry, layer_params):
      out = _sp_layer(layer_params, carry, paddings, key_mask, cfg, axis)
      return out, None

    if cfg.remat:
      body = jax.checkpoint(
          body, policy=jax.checkpoint_policies.nothing_saveable,
          prevent_cse=False)
    outputs, _ = jax.lax.scan(body, inputs, params['x_layers'])
  else:
    outputs = inputs
    for i in range(cfg.num_layers):
      outputs = _sp_layer(
          params[f'x_layers_{i}'], outputs, paddings, key_mask, cfg, axis)
  return outputs


def sp_atten_token_pooling(
    params: Params,
    tokens: Array,            # [B, T_local, D] — token shard
    paddings: Array | None,   # [B, T_local]
    *,
    num_heads: int,
    hidden_dim: int = 0,
    axis: str,
    add_layer_norm: bool = True,
    enable_per_dim_scale: bool = True,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Array:
  """Sequence-parallel attentional token pooling (distributed softmax).

  Mirrors :func:`videoprism_tpu.ops.transformer.atten_token_pooling`
  (reference videoprism/layers.py:1044-1136) with the key/value tokens
  sharded over ``axis``: local logits -> ``pmax`` row max -> ``psum``
  exp-sum -> ``psum`` of the *projected* value partials, so the gathered
  sequence never materializes.  Returns replicated [B, num_queries, D].
  """
  input_dim = tokens.shape[-1]
  hidden_dim = hidden_dim if hidden_dim > 0 else 4 * input_dim

  if paddings is None:
    paddings = jnp.zeros(tokens.shape[:-1], dtype=tokens.dtype)
  key_mask = mask_lib.paddings_to_mask(paddings, paddings.dtype)

  q, k, v = attention_lib.pooling_projections(
      params, tokens, num_heads=num_heads, hidden_dim=hidden_dim,
      enable_per_dim_scale=enable_per_dim_scale, use_bias=use_bias,
      dtype=dtype)

  logits = jnp.einsum('BNQH,BNSH->BNQS', q, k).astype(jnp.float32)
  logits = mask_lib.apply_mask_to_logits(logits, key_mask)
  # Softmax is shift-invariant, so the row max contributes no gradient:
  # stop_gradient keeps the distributed max differentiable (pmax has no
  # VJP rule) without changing any derivative.
  row_max = jax.lax.pmax(
      jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True)), axis)
  unnorm = jnp.exp(logits - row_max)
  denom = jax.lax.psum(jnp.sum(unnorm, axis=-1, keepdims=True), axis)
  probs = (unnorm / denom).astype(dtype)
  encoded = jnp.einsum('BNQS,BNSH->BNQH', probs, v)

  mha = params['pooling_attention']
  post_w = basic.cast_floating(mha['post']['w'], dtype)
  outputs = jax.lax.psum(
      jnp.einsum('BNQH,DNH->BQD', encoded, post_w), axis)
  if use_bias:
    outputs = outputs + basic.cast_floating(mha['post']['b'], dtype)

  if add_layer_norm:
    outputs = basic.layer_norm(
        params['pooling_attention_layer_norm'], outputs, dtype=dtype)
  return outputs


def _aux_pooler_local(
    params: Params,
    tokens: Array,            # [B_local, T_local, D]
    aux_cfg: TransformerLayerConfig,
    num_heads: int,
    model_dim: int,
    dtype,
    axis: str,
) -> Array:
  """Aux ViT + contrastive pooler + l2-norm on a token shard (in-shard_map).

  The same tail as ``clip.encode_vision`` (reference
  videoprism/encoders.py:846-867), sequence-parallel.
  """
  if aux_cfg.num_layers > 0:
    tokens = sp_stacked_transformer(
        params['auxiliary_encoder']['transformers_stack'], tokens, None,
        aux_cfg, axis=axis)
  emb = sp_atten_token_pooling(
      params['contrastive_vision_pooler'], tokens, None,
      num_heads=num_heads, hidden_dim=model_dim * 4, axis=axis,
      dtype=dtype)
  return basic.l2_normalize(jnp.squeeze(emb, axis=-2), axis=-1)


def make_sp_aux_pooler_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    kernel_interpret: bool = False,
) -> Callable[[Params, Array], Array]:
  """Sequence-parallel aux-ViT + pooler: tokens [B, T*N, D] -> emb [B, D].

  ``cfg`` is a :class:`videoprism_tpu.models.clip.VideoCLIPConfig`; params
  is the CLIP tree (replicated — the aux/pooler weights are small).  The
  token sequence shards over the ``model`` mesh axis, batch over ``data``.
  Use this when the spatiotemporal features already exist (e.g. streamed
  long-video windows) and only the full-sequence tail needs sharding.
  """
  aux_cfg = dataclasses.replace(
      cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers),
      kernel_interpret=kernel_interpret, tp_axis=None)
  _validate_sp_cfg(aux_cfg)
  P = PartitionSpec

  def local(p, toks):
    return _aux_pooler_local(
        p, toks, aux_cfg, cfg.num_heads, cfg.model_dim, cfg.dtype,
        mesh_lib.MODEL_AXIS)

  sharded = mesh_lib.shard_map_compat(
      local, mesh,
      in_specs=(P(), P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS, None)),
      out_specs=P(mesh_lib.DATA_AXIS, None))

  def fwd(p, toks):
    _check_sp_shapes(mesh, batch=toks.shape[0], tokens=toks.shape[1])
    return sharded(p, toks)

  return jax.jit(fwd)


def make_sp_clip_vision_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    kernel_interpret: bool = False,
) -> Callable[[Params, Array], Array]:
  """Sequence-parallel CLIP video embedding: video [B,T,H,W,3] -> [B, D].

  Two sharding regimes inside one jit, matched to the architecture:

    1. factorized encoder — clips are embarrassingly parallel, so the
       batch shards over BOTH mesh axes (``model`` folds into data
       parallelism: no idle devices during the dominant stage);
    2. aux ViT + pooler — the only full-sequence attentions — reshard to
       batch over ``data`` x sequence over ``model`` (XLA inserts the
       all-to-all between the two shard_maps) and run sequence-parallel.

  Requires B divisible by data*model.  Params stay replicated.
  """
  vis_cfg = dataclasses.replace(
      cfg.vision_config(), kernel_interpret=kernel_interpret, tp_axis=None)
  aux_cfg = dataclasses.replace(
      cfg.vision_config().vit_layer_config(cfg.num_auxiliary_layers),
      kernel_interpret=kernel_interpret, tp_axis=None)
  _validate_sp_cfg(aux_cfg)
  P = PartitionSpec
  both = (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS)

  from videoprism_tpu.models import factorized_encoder as fe

  enc = mesh_lib.shard_map_compat(
      lambda p, v: fe.apply(p, v, vis_cfg, train=False)[0],
      mesh,
      in_specs=(P(), P(both, None, None, None, None)),
      out_specs=P(both, None, None))

  def local(p, toks):
    return _aux_pooler_local(
        p, toks, aux_cfg, cfg.num_heads, cfg.model_dim, cfg.dtype,
        mesh_lib.MODEL_AXIS)

  sp_tail = mesh_lib.shard_map_compat(
      local, mesh,
      in_specs=(P(), P(mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS, None)),
      out_specs=P(mesh_lib.DATA_AXIS, None))

  def fwd(p, video):
    # Trace-time precondition checks: a violation otherwise surfaces as
    # an opaque XLA sharding error deep inside the shard_maps (tp.py's
    # validate_tp_config is the analogous guard for the TP tier).
    dp = mesh.shape[mesh_lib.DATA_AXIS]
    sp = mesh.shape[mesh_lib.MODEL_AXIS]
    if video.shape[0] % (dp * sp):
      raise ValueError(
          f'batch {video.shape[0]} not divisible by data*model = '
          f'{dp}*{sp} (the encoder stage folds both axes into data '
          'parallelism)')
    tokens = enc(p['vision_encoder'], video)   # [B, T*N, D]
    _check_sp_shapes(mesh, batch=tokens.shape[0], tokens=tokens.shape[1])
    return sp_tail(p, tokens)

  return jax.jit(fwd)


def _check_sp_shapes(mesh: Mesh, *, batch: int, tokens: int) -> None:
  dp = mesh.shape[mesh_lib.DATA_AXIS]
  sp = mesh.shape[mesh_lib.MODEL_AXIS]
  if batch % dp:
    raise ValueError(f'batch {batch} not divisible by the data axis '
                     f'({dp})')
  if tokens % sp:
    raise ValueError(f'sequence length {tokens} not divisible by the '
                     f'model axis ({sp}) — sequence parallelism shards '
                     'tokens over it')
