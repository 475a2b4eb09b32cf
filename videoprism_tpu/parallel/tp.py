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
  sharded_params = shard_lib.shard_params(params, mesh)
  video_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None, None, None)
  out_spec = PartitionSpec(mesh_lib.DATA_AXIS, None, None)

  def fwd(p, video):
    emb, _ = fe.apply(p, video, tp_cfg, train=train)
    return emb

  sharded = mesh_lib.shard_map_compat(
      fwd, mesh, in_specs=(param_specs, video_spec), out_specs=out_spec)
  return jax.jit(sharded), sharded_params
