"""Pipeline parallelism over the stacked transformer layers.

The reference's only depth-scaling machinery is weight-stacked scan + remat
(reference videoprism/layers.py:875-937); it has no way to split a tower's
LAYERS across devices.  This module adds GPipe-style pipeline parallelism
the TPU-native way: the stacked ``x_layers`` weights shard their leading
layer axis over a mesh axis (each stage holds ``L/S`` layers — the memory
win pipeline parallelism exists for), and microbatches flow stage-to-stage
through explicit ``ppermute`` collectives riding ICI neighbors.

Schedule: classic GPipe fill-and-drain.  With ``S`` stages and ``M``
microbatches the loop runs ``M + S - 1`` ticks; at tick ``t`` stage ``i``
processes microbatch ``t - i`` (out-of-range ticks compute on zeros and are
masked out).  Because the stage->microbatch mapping is deterministic, every
stage can slice its own paddings locally — only activations travel.

The tick loop is a ``lax.scan`` (not ``fori_loop``) so the whole pipeline
is reverse-differentiable: gradients flow back through the ``ppermute``s
(transpose = reverse permutation), giving a correct — if bubble-paying —
backward pipeline without a hand-written 1F1B schedule.

Inside a stage the per-layer compute is the ordinary
:func:`videoprism_tpu.ops.transformer.transformer_layer` — the fused Pallas
kernels (opaque to GSPMD, which is why this is a shard_map and not a pjit
sharding) stay on the fast path.

Composability: the pipeline reuses the ``model`` mesh axis (alternative use
to TP/SP, Megatron-style), and the batch axis shards over ``data`` as
usual — each data-parallel group runs its own pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from videoprism_tpu.ops import masks as mask_lib
from videoprism_tpu.ops.transformer import (
    TransformerLayerConfig,
    transformer_layer,
)
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib

Array = jax.Array
Params = Any


def _validate_pp_cfg(cfg: TransformerLayerConfig, n_stages: int) -> None:
  if not cfg.scan:
    raise NotImplementedError(
        'pipeline parallelism requires the stacked (scan=True) weight '
        'layout — the per-stage layer chunk scans over its weight shard')
  if cfg.num_layers % n_stages:
    raise ValueError(
        f'num_layers={cfg.num_layers} not divisible by {n_stages} stages')
  if cfg.tp_axis is not None:
    raise ValueError(
        'tp_axis and pipeline parallelism reuse the same mesh axis — '
        'build the pipeline with tp_axis=None')


def _stage_chunk(
    stage_params: Params,   # leaves [L/S, ...]
    x: Array,               # [Bm, T, D]
    paddings: Array,        # [Bm, T]
    atten_mask: Array,
    cfg: TransformerLayerConfig,
) -> Array:
  """Run this stage's L/S layers (ordinary scan over stacked weights)."""

  def body(carry, layer_params):
    out = transformer_layer(
        layer_params, carry, paddings, atten_mask, cfg, train=False)
    return out, None

  if cfg.remat:
    body = jax.checkpoint(
        body, policy=jax.checkpoint_policies.nothing_saveable,
        prevent_cse=False)
  out, _ = jax.lax.scan(body, x, stage_params)
  return out


def pp_stacked_transformer(
    stage_params: Params,    # this stage's shard: leaves [L/S, ...]
    inputs: Array,           # [M, Bm, T, D] microbatched inputs (replicated)
    paddings: Array,         # [M, Bm, T]
    cfg: TransformerLayerConfig,
    *,
    axis: str,
    n_stages: int,
) -> Array:
  """GPipe pipeline over one transformer stack; call INSIDE a shard_map.

  Every stage receives the full microbatched input (stage 0 is the only
  consumer; keeping it replicated avoids a scatter) and returns the full
  [M, Bm, T, D] output, valid on every stage (psum-broadcast from the last
  stage so downstream per-shard code can continue uniformly).
  """
  m, bm = inputs.shape[0], inputs.shape[1]
  stage = jax.lax.axis_index(axis)

  def mb_slice(arr, t):
    """arr[t] with out-of-range ticks clamped (their results are masked)."""
    idx = jnp.clip(t, 0, m - 1)
    return jax.lax.dynamic_index_in_dim(arr, idx, axis=0, keepdims=False)

  def tick(carry, t):
    buf_in, outputs = carry
    mb_id = t - stage  # deterministic GPipe stage->microbatch mapping
    x = jnp.where(stage == 0, mb_slice(inputs, t), buf_in)
    pad = mb_slice(paddings, mb_id)
    atten_mask = mask_lib.attention_mask_for_fprop(
        x, pad, causal_attention=cfg.enable_causal_atten)
    y = _stage_chunk(stage_params, x, pad, atten_mask, cfg)

    # Hand to the next stage (last stage's edge is dropped — ppermute
    # delivers zeros to stage 0, which overwrites them with microbatch
    # t+1 anyway).
    buf_next = jax.lax.ppermute(
        y, axis, [(i, i + 1) for i in range(n_stages - 1)])

    # The last stage finished microbatch mb_id this tick.
    valid = jnp.logical_and(
        stage == n_stages - 1,
        jnp.logical_and(mb_id >= 0, mb_id < m))
    outputs = jax.lax.dynamic_update_index_in_dim(
        outputs,
        jnp.where(valid, y, mb_slice(outputs, mb_id)),
        jnp.clip(mb_id, 0, m - 1), axis=0)
    return (buf_next, outputs), None

  buf0 = jnp.zeros_like(inputs[0])
  out0 = jnp.zeros_like(inputs)
  (_, outputs), _ = jax.lax.scan(
      tick, (buf0, out0), jnp.arange(m + n_stages - 1))

  # Broadcast the last stage's outputs to every stage.
  outputs = jnp.where(stage == n_stages - 1, outputs, 0.0)
  return jax.lax.psum(outputs, axis)


def make_pp_encoder_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    n_microbatches: int,
    kernel_interpret: bool = False,
) -> Callable[[Params, Array], Array]:
  """Pipeline-parallel FactorizedEncoder forward (serving path).

  The SPATIAL stack — where the depth lives (40 of giant's 44 layers) —
  shards its stacked layer weights over the ``model`` axis and runs the
  GPipe schedule; everything else (patch/pos embeddings, boundaries, the
  4-layer temporal stack, LNs) stays replicated and runs redundantly per
  stage (<10% of FLOPs at giant — the price of zero drift from the
  reference flow, which runs unmodified around the pipelined stack via
  the ``stack_override`` hook in ``factorized_encoder.apply``).

  Microbatches split the spatial batch of B*T frame rows, so even a
  single clip pipelines over its frames.  Returns ``(fn, sharded_params)``
  with ``fn(params, video [B,T,H,W,3]) -> [B, T*N, D]``; the video batch
  shards over ``data``; per-shard ``B_local*T`` must be divisible by
  ``n_microbatches``.
  """
  from videoprism_tpu.models import factorized_encoder as fe

  n_stages = mesh.shape[mesh_lib.MODEL_AXIS]
  enc_cfg = dataclasses.replace(
      cfg, kernel_interpret=kernel_interpret, tp_axis=None)
  _validate_pp_cfg(
      enc_cfg.vit_layer_config(enc_cfg.num_spatial_layers), n_stages)
  P = PartitionSpec

  def param_spec(path, _):
    names = shard_lib._key_path(path)
    if 'spatial_encoder' in names and 'x_layers' in names:
      return P(mesh_lib.MODEL_AXIS)
    return P()

  param_specs = jax.tree_util.tree_map_with_path(param_spec, params)

  def local(p, video):
    def override(name, stack_params, x, stack_cfg, paddings):
      if name != 'spatial_encoder':
        return None
      stack_cfg = dataclasses.replace(
          stack_cfg, pack_small_sequences=False)
      m = n_microbatches
      bl = x.shape[0]
      if bl % m:
        raise ValueError(
            f'per-shard spatial batch {bl} (frames) not divisible by '
            f'{m} microbatches')
      pad = (jnp.zeros(x.shape[:-1], x.dtype) if paddings is None
             else paddings)
      xm = x.reshape(m, bl // m, *x.shape[1:])
      pm = pad.reshape(m, bl // m, *pad.shape[1:])
      out = pp_stacked_transformer(
          stack_params['transformers_stack']['x_layers'], xm, pm,
          stack_cfg, axis=mesh_lib.MODEL_AXIS, n_stages=n_stages)
      return out.reshape(bl, *out.shape[2:])

    emb, _ = fe.apply(
        p, video, enc_cfg, train=False, stack_override=override)
    return emb

  sharded = mesh_lib.shard_map_compat(
      local, mesh,
      in_specs=(param_specs, P(mesh_lib.DATA_AXIS, None, None, None, None)),
      out_specs=P(mesh_lib.DATA_AXIS, None, None))
  sharded_params = shard_lib.shard_params(params, mesh, specs=param_specs)
  return jax.jit(sharded), sharded_params


def make_pp_stack_forward(
    params: Params,
    cfg: TransformerLayerConfig,
    mesh: Mesh,
    *,
    n_microbatches: int,
    kernel_interpret: bool = False,
) -> Callable[[Params, Array, Array], Array]:
  """Pipeline-parallel stacked-transformer forward over the mesh.

  Returns ``fn(params, inputs [B, T, D], paddings [B, T]) -> [B, T, D]``
  with the stack's layers sharded over the ``model`` axis (``L/S`` layers
  resident per device) and the batch sharded over ``data``.  ``B`` must be
  divisible by ``data * n_microbatches``.
  """
  n_stages = mesh.shape[mesh_lib.MODEL_AXIS]
  cfg = dataclasses.replace(
      cfg, kernel_interpret=kernel_interpret, tp_axis=None,
      pack_small_sequences=False)
  _validate_pp_cfg(cfg, n_stages)
  P = PartitionSpec

  def local(stage_layers, x, pad):
    m = n_microbatches
    b_local = x.shape[0]
    if b_local % m:
      raise ValueError(
          f'per-data-shard batch {b_local} not divisible by '
          f'{m} microbatches')
    xm = x.reshape(m, b_local // m, *x.shape[1:])
    pm = pad.reshape(m, b_local // m, *pad.shape[1:])
    out = pp_stacked_transformer(
        stage_layers, xm, pm, cfg, axis=mesh_lib.MODEL_AXIS,
        n_stages=n_stages)
    return out.reshape(b_local, *out.shape[2:])

  sharded = mesh_lib.shard_map_compat(
      local, mesh,
      in_specs=(P(mesh_lib.MODEL_AXIS), P(mesh_lib.DATA_AXIS, None, None),
                P(mesh_lib.DATA_AXIS, None)),
      out_specs=P(mesh_lib.DATA_AXIS, None, None))

  def fwd(p, x, paddings):
    # Flash sublane rule: pad awkward T (e.g. text 64+1 cls) with fully
    # masked tokens, as stacked_transformer does.
    t = x.shape[1]
    pad_t = (-t) % 8 if cfg.attention_impl == 'flash' else 0
    if pad_t:
      x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
      paddings = jnp.pad(
          paddings, ((0, 0), (0, pad_t)), constant_values=1.0)
    out = sharded(p['x_layers'], x, paddings)
    return out[:, :t] if pad_t else out

  return jax.jit(fwd)
