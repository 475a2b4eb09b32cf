"""Worker for the real multi-process test (spawned by test_multiprocess.py).

Each process: initialize jax.distributed through our wrapper, build a
global (data, model) mesh spanning both processes, run a TP+DP-sharded
tiny-encoder forward, and check it against the locally computed
single-process reference.
"""

import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)

from videoprism_tpu.parallel import distributed

distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                       num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc, jax.process_count()
assert distributed.is_primary() == (proc_id == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from videoprism_tpu.models import factorized_encoder as fe
from videoprism_tpu.models import init as init_lib
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.parallel import sharding as shard_lib

cfg = fe.FactorizedEncoderConfig(
    patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
    num_spatial_layers=2, num_temporal_layers=1, num_heads=2, mlp_dim=32,
    atten_logit_cap=50.0, scan=True)
# Same seed everywhere -> host params identical across processes.
params = init_lib.init_factorized_encoder(jax.random.PRNGKey(0), cfg)

mesh = mesh_lib.make_mesh(model_parallelism=2)  # (2, 2) over 4 global devs
assert mesh.devices.size == nproc * 2
sharded_params = shard_lib.shard_params(params, mesh)

# Global batch of 4: each process contributes its local half.
rng = np.random.default_rng(0)
global_video = rng.random((4, 2, 12, 12, 3)).astype(np.float32)
local = global_video[proc_id * 2:(proc_id + 1) * 2]
batch_sharding = NamedSharding(
    mesh, PartitionSpec(mesh_lib.DATA_AXIS, None, None, None, None))
video = jax.make_array_from_process_local_data(
    batch_sharding, local, global_video.shape)

fwd = jax.jit(
    lambda p, v: fe.apply(p, v, cfg, train=False)[0],
    out_shardings=NamedSharding(mesh, PartitionSpec()))
with mesh:
  emb = fwd(sharded_params, video)

ref, _ = fe.apply(params, jnp.asarray(global_video), cfg, train=False)
err = float(jnp.max(jnp.abs(emb - ref)))
assert err < 1e-5, f'proc {proc_id}: mismatch {err}'
print(f'MULTIHOST-OK proc={proc_id} err={err:.2e}', flush=True)
