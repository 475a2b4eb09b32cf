"""Parallelism tier: device meshes, GSPMD shardings, multi-host init."""

from videoprism_tpu.parallel import distributed
from videoprism_tpu.parallel import fsdp
from videoprism_tpu.parallel import pp
from videoprism_tpu.parallel import sp
from videoprism_tpu.parallel import tp
from videoprism_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    local_batch_size,
    make_mesh,
    replicated,
)
from videoprism_tpu.parallel.sharding import (
    param_partition_specs,
    param_shardings,
    partition_spec_for,
    shard_params,
)

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'data_sharding', 'distributed', 'fsdp',
    'local_batch_size', 'make_mesh', 'param_partition_specs',
    'param_shardings', 'partition_spec_for', 'pp', 'replicated',
    'shard_params', 'sp', 'tp',
]
