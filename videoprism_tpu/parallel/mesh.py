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
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> Mesh:
  """Builds a ``(data, model)`` mesh over all (or given) devices.

  ``model_parallelism`` devices form the tensor-parallel group (innermost —
  adjacent on the ICI torus, where the per-layer collectives ride);
  the remainder is the data-parallel axis.
  """
  devices = np.asarray(devices if devices is not None else jax.devices())
  n = devices.size
  if n % model_parallelism != 0:
    raise ValueError(
        f'{n} devices not divisible by model_parallelism={model_parallelism}')
  grid = devices.reshape(n // model_parallelism, model_parallelism)
  return Mesh(grid, (data_axis, model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, PartitionSpec())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
  """Shards the leading (batch) axis over the data axis."""
  return NamedSharding(
      mesh, PartitionSpec(DATA_AXIS, *([None] * (ndim - 1))))


def local_batch_size(mesh: Mesh, global_batch_size: int) -> int:
  dp = mesh.shape[DATA_AXIS]
  if global_batch_size % dp != 0:
    raise ValueError(
        f'global batch {global_batch_size} not divisible by dp={dp}')
  return global_batch_size // dp
