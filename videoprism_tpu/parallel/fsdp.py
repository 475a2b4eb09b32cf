"""FSDP / ZeRO-3 parameter + optimizer-state sharding over the data axis.

The reference has no training or distributed code at all (SURVEY.md §2.7);
this module is the TPU-native memory-scaling axis for *training*: on top of
the tensor-parallel layout in :mod:`videoprism_tpu.parallel.sharding`, every
sufficiently large parameter additionally shards one of its remaining
dimensions over the ``data`` mesh axis.  Expressed purely as PartitionSpecs,
GSPMD then lowers to the canonical FSDP schedule:

  * forward / backward: per-layer ``all-gather`` of the weight shards
    (inside the scan loop body, so only one layer's weights are ever
    materialized per device — the stacked layer axis itself is never the
    FSDP axis);
  * gradients: ``reduce-scatter`` back to the shards (instead of the
    data-parallel all-reduce);
  * optimizer update: runs on the shards — AdamW moments are sharded by
    construction, so optimizer memory drops by the data-axis size too.

Param memory per chip goes from ``P`` (replicated DP) to ``P / dp`` and
optimizer state from ``2P`` to ``2P / dp``, at the cost of one weight
all-gather per layer per direction riding the ICI data axis.

Composes with tensor parallelism: the ``model``-axis spec from
``partition_spec_for`` is kept and the FSDP axis is chosen among the
still-replicated dimensions (the classic 2-D "hybrid sharded" layout).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from videoprism_tpu.parallel.mesh import DATA_AXIS
from videoprism_tpu.parallel import sharding as shard_lib

Params = Any

# Leaves smaller than this many elements stay on their TP spec: sharding a
# [D]-sized LayerNorm scale buys ~nothing and costs a collective per use.
DEFAULT_MIN_SIZE = 2 ** 16


def add_fsdp_axis(
    base: PartitionSpec,
    shape: tuple[int, ...],
    data_size: int,
    *,
    min_size: int = DEFAULT_MIN_SIZE,
    skip_leading: bool = False,
) -> PartitionSpec:
  """Shards the largest still-replicated, divisible dim over ``data``.

  ``base`` is the tensor-parallel spec: full-rank (the partition rules
  right-align to full rank, ``sharding._spec``) or empty (fully
  replicated).  Any other length is rejected — padding a partial spec
  here would have to guess the alignment convention and a wrong guess
  silently mis-shards the weight.  Ties prefer the later dimension.
  ``skip_leading`` excludes dim 0 (the scan-stacked layer axis: sharding it
  would turn every scan iteration's layer slice into a cross-device gather
  instead of a per-layer all-gather).
  """
  size = 1
  for d in shape:
    size *= d
  if data_size <= 1 or size < min_size:
    return base
  if len(base) not in (0, len(shape)):
    raise ValueError(
        f'partial partition spec {tuple(base)} for rank-{len(shape)} leaf; '
        'FSDP augmentation needs full-rank (right-aligned) or empty specs')
  spec = list(base) if base else [None] * len(shape)
  best = None
  for i, (entry, dim) in enumerate(zip(spec, shape)):
    if entry is not None or dim % data_size:
      continue
    if skip_leading and i == 0:
      continue
    if best is None or dim >= shape[best]:
      best = i
  if best is None:
    return base
  spec[best] = DATA_AXIS
  return PartitionSpec(*spec)


def fsdp_partition_specs(
    params: Params,
    data_size: int,
    *,
    min_size: int = DEFAULT_MIN_SIZE,
    stacked_key: str = 'x_layers',
) -> Params:
  """TP PartitionSpecs augmented with a ``data``-axis FSDP dim per leaf.

  Leaves under a ``stacked_key`` path component are scan-stacked
  ``[num_layers, ...]`` weights; their leading layer axis is excluded from
  the FSDP split (see :func:`add_fsdp_axis`).
  """

  def spec(path, leaf):
    keys = shard_lib._key_path(path)
    base = shard_lib.partition_spec_for(keys, leaf.ndim)
    return add_fsdp_axis(
        base, leaf.shape, data_size, min_size=min_size,
        skip_leading=stacked_key in keys)

  return jax.tree_util.tree_map_with_path(spec, params)


def fsdp_param_shardings(
    params: Params,
    mesh: Mesh,
    *,
    min_size: int = DEFAULT_MIN_SIZE,
) -> Params:
  """NamedSharding pytree for the hybrid TP x FSDP layout over ``mesh``."""
  specs = fsdp_partition_specs(
      params, mesh.shape[DATA_AXIS], min_size=min_size)
  return jax.tree.map(
      lambda s: NamedSharding(mesh, s), specs,
      is_leaf=lambda x: isinstance(x, PartitionSpec))


def shard_params_fsdp(
    params: Params,
    mesh: Mesh,
    *,
    min_size: int = DEFAULT_MIN_SIZE,
) -> Params:
  """Places a param tree into the TP x FSDP layout."""
  return jax.device_put(
      params, fsdp_param_shardings(params, mesh, min_size=min_size))
