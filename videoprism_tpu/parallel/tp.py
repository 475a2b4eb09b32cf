"""Manual tensor parallelism via shard_map — keeps the fused kernels.

GSPMD cannot partition a ``pallas_call`` (it is an opaque custom call), so
the pjit/GSPMD tensor-parallel path (:mod:`videoprism_tpu.parallel.sharding`)
requires ``attention_impl='xla'`` and forfeits every fused block kernel —
exactly on the giant-scale towers TP exists for.

This module takes the other route: ``shard_map`` the whole encoder forward
over the ``(data, model)`` mesh with params head-/hidden-sharded over
``model`` (the same Megatron split as the GSPMD rules).  Inside the shard,
each device runs the ordinary single-device program — including the fused
Pallas block kernels, in per-shard "partial output" mode — and the two
cross-shard contractions per layer (attention output projection, second FFN
matmul) are explicit ``psum`` collectives riding ICI.

The per-layer math is identical to the GSPMD lowering; what changes is that
the kernels stay on the fast path.  See ops/transformer.py
(``TransformerLayerConfig.tp_axis``) for the psum insertion points.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
from jax.sharding import Mesh, PartitionSpec

from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib

Params = Any


def validate_tp_config(cfg, mesh: Mesh) -> None:
  """Head/hidden divisibility checks for the Megatron split."""
  tp = mesh.shape[mesh_lib.MODEL_AXIS]
  if cfg.num_heads % tp:
    raise ValueError(
        f'num_heads={cfg.num_heads} not divisible by model axis size {tp}')
  if cfg.mlp_dim % tp:
    raise ValueError(
        f'mlp_dim={cfg.mlp_dim} not divisible by model axis size {tp}')


def make_tp_encoder_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    train: bool = False,
    kernel_interpret: bool = False,
) -> tuple[Callable[[Params, jax.Array], jax.Array], Params]:
  """Tensor+data-parallel FactorizedEncoder forward with fused kernels.

  Returns ``(jitted_forward, sharded_params)``: params are laid out per the
  Megatron rules (heads/MLP-hidden over ``model``), the video batch splits
  over ``data``, and the per-shard program keeps every Pallas fast path.

  ``kernel_interpret=True`` runs the kernels in interpret mode, which lets
  the full TP+kernels path execute on a virtual CPU mesh (tests, dryrun).
  """
  from videoprism_tpu.models import factorized_encoder as fe

  validate_tp_config(cfg, mesh)
  tp_cfg = dataclasses.replace(
      cfg, tp_axis=mesh_lib.MODEL_AXIS, kernel_interpret=kernel_interpret)

  param_specs = shard_lib.param_partition_specs(params)
  sharded_params = shard_lib.shard_params(params, mesh, specs=param_specs)
  video_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None, None, None)
  out_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None)

  def fwd(p, video):
    emb, _ = fe.apply(p, video, tp_cfg, train=train)
    return emb

  sharded = mesh_lib.shard_map_compat(
      fwd, mesh, in_specs=(param_specs, video_spec), out_specs=out_spec)
  return jax.jit(sharded), sharded_params


def _clip_param_specs(params: Params) -> Params:
  """Megatron layout for a CLIP tree, vocabulary embedding replicated
  (same convention as train.tp_train_step: 32k x D is small and a plain
  replicated lookup beats a masked-lookup+psum under manual TP)."""
  from jax.sharding import PartitionSpec as PS

  specs = shard_lib.param_partition_specs(params)
  if 'text_encoder' in specs and 'token_emb' in specs['text_encoder']:
    specs['text_encoder']['token_emb'] = jax.tree.map(
        lambda _: PS(), specs['text_encoder']['token_emb'],
        is_leaf=lambda x: isinstance(x, PS))
  return specs


def make_tp_clip_vision_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    train: bool = False,
    kernel_interpret: bool = False,
) -> tuple[Callable[[Params, jax.Array], jax.Array], Params]:
  """Tensor+data-parallel CLIP *video* embedding with fused kernels.

  Serves the vision side of an lvt tower (FactorizedEncoder + auxiliary
  ViT + contrastive pooler + l2-norm): params Megatron-sharded over
  ``model`` (vision, aux, pooler and the unused-but-resident text tower
  alike; vocabulary embedding replicated), batch over ``data``.  The
  text tower is skipped via the None-modality contract
  (reference videoprism/encoders.py:783-910).
  """
  from videoprism_tpu.models import clip as vclip

  validate_tp_config(cfg, mesh)
  tp_cfg = dataclasses.replace(
      cfg, tp_axis=mesh_lib.MODEL_AXIS, kernel_interpret=kernel_interpret)

  param_specs = _clip_param_specs(params)
  sharded_params = shard_lib.shard_params(params, mesh, specs=param_specs)
  video_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None, None, None)
  out_spec = PartitionSpec(mesh_lib.DATA_AXIS, None)

  def fwd(p, video):
    v_emb, _, _ = vclip.apply(p, video, None, None, tp_cfg, train=train)
    return v_emb

  sharded = mesh_lib.shard_map_compat(
      fwd, mesh, in_specs=(param_specs, video_spec), out_specs=out_spec)
  return jax.jit(sharded), sharded_params


def make_tp_classifier_forward(
    params: Params,
    cfg,
    mesh: Mesh,
    *,
    train: bool = False,
    kernel_interpret: bool = False,
) -> tuple[Callable[[Params, jax.Array], jax.Array], Params]:
  """Tensor+data-parallel video classifier (encoder + pooler + head).

  ``cfg`` is a :class:`VideoClassifierConfig`; the TP knobs live on its
  nested encoder config.  Returns logits [B, num_classes].
  """
  from videoprism_tpu.models import classifier as vc

  validate_tp_config(cfg.encoder, mesh)
  tp_cfg = dataclasses.replace(
      cfg, encoder=dataclasses.replace(
          cfg.encoder, tp_axis=mesh_lib.MODEL_AXIS,
          kernel_interpret=kernel_interpret))

  param_specs = shard_lib.param_partition_specs(params)
  sharded_params = shard_lib.shard_params(params, mesh, specs=param_specs)
  video_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None, None, None)
  out_spec = PartitionSpec(mesh_lib.DATA_AXIS, None)

  def fwd(p, video):
    logits, _ = vc.apply(p, video, tp_cfg, train=train)
    return logits

  sharded = mesh_lib.shard_map_compat(
      fwd, mesh, in_specs=(param_specs, video_spec), out_specs=out_spec)
  return jax.jit(sharded), sharded_params
