"""Device-mesh construction for single- and multi-host TPU topologies.

The reference has no parallelism layer at all (SURVEY.md §2.7); this module
is the TPU-native scaling substrate: a 2-D ``(data, model)``
``jax.sharding.Mesh`` over ICI, with data-parallel batch sharding for batched
clip embedding and tensor-parallel sharding of attention heads / MLP hidden
for the large/giant towers.  All communication is compiler-inserted GSPMD
collectives — there is no hand-written comm layer to maintain.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(
    model_parallelism: int = 1,
    *,
    devices=None,
) -> Mesh:
  """Builds a ``(data, model)`` mesh over all (or given) devices.

  ``model_parallelism`` devices form the tensor-parallel group (innermost —
  adjacent on the ICI torus, where the per-layer collectives ride);
  the remainder is the data-parallel axis.  Axis names are fixed to
  ``('data', 'model')``: every sharding rule, psum axis, and spec in the
  parallel tier references these names.
  """
  devices = np.asarray(devices if devices is not None else jax.devices())
  n = devices.size
  if n % model_parallelism != 0:
    raise ValueError(
        f'{n} devices not divisible by model_parallelism={model_parallelism}')
  grid = devices.reshape(n // model_parallelism, model_parallelism)
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_map_compat(fn, mesh: Mesh, in_specs, out_specs):
  """``jax.shard_map`` with replication checks off, falling back to the
  pre-0.5 ``jax.experimental.shard_map`` API.  The single home for this
  shim — TP, TP training, and DP serving all route through it."""
  try:
    from functools import partial

    return partial(jax.shard_map, check_vma=False)(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
  # TypeError covers the transition window where jax.shard_map exists
  # but still names the kwarg check_rep — without it the shim crashes
  # instead of degrading to the experimental API.
  except (AttributeError, TypeError):  # jax < 0.5 / renamed kwarg
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, PartitionSpec())


def data_sharding(mesh: Mesh, ndim: int = 1,
                  *, batch_axis: int = 0) -> NamedSharding:
  """Shards the batch axis over the data axis.

  ``batch_axis`` selects which dimension is the batch (1 for
  gradient-accumulation batches shaped ``[accum, batch, ...]``, where the
  leading microbatch axis must stay unsharded so the accumulation scan
  slices it locally).
  """
  spec = [None] * ndim
  spec[batch_axis] = DATA_AXIS
  return NamedSharding(mesh, PartitionSpec(*spec))


def local_batch_size(mesh: Mesh, global_batch_size: int) -> int:
  dp = mesh.shape[DATA_AXIS]
  if global_batch_size % dp != 0:
    raise ValueError(
        f'global batch {global_batch_size} not divisible by dp={dp}')
  return global_batch_size // dp
