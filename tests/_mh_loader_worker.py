"""Worker for the multi-host data-loader test (spawned by
test_multiprocess.py).

Each process: initialize jax.distributed, build a global data mesh, run
``batched_loader`` in multi-host mode (this process decodes only its half
of the global batch), and check the assembled global batch — via a jitted
replicated sum — against a locally decoded full-batch reference.  Covers
both the flat layout and the gradient-accumulation ``[accum, batch, ...]``
layout.
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

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from videoprism_tpu import assets
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import registry
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.train import data as data_lib

mesh = mesh_lib.make_mesh()  # (data=4, model=1) over both processes
tokenizer = SentencePieceTokenizer(assets.test_spm_path())
source = data_lib.SyntheticSource(num_examples=12, num_frames=2, size=12)

repl = NamedSharding(mesh, PartitionSpec())
sum_all = jax.jit(lambda t: jax.tree.map(
    lambda x: jnp.sum(x.astype(jnp.float32)), t), out_shardings=repl)


def reference_batch(indices, accum=None):
  clips, caps = zip(*(source.get(i) for i in indices))
  ids, paddings = registry.tokenize_texts(tokenizer, list(caps),
                                          max_length=8)
  ref = {'video': np.stack(clips), 'text_token_ids': np.asarray(ids),
         'text_paddings': np.asarray(paddings)}
  if accum:
    ref = {k: v.reshape(accum, len(indices) // accum, *v.shape[1:])
           for k, v in ref.items()}
  return ref


# --- flat layout: global batch 4, each process decodes 2 rows ---
with mesh:
  batch = next(iter(data_lib.batched_loader(
      source, tokenizer, batch_size=4, shuffle=False, num_epochs=1,
      max_text_len=8, num_workers=1,
      sharding=lambda ndim: mesh_lib.data_sharding(mesh, ndim))))
assert batch['video'].shape == (4, 2, 12, 12, 3), batch['video'].shape
assert len(batch['video'].sharding.device_set) == 4  # a global array
ref = reference_batch(range(4))
got = jax.tree.map(float, sum_all(batch))
for k, v in ref.items():
  np.testing.assert_allclose(got[k], v.astype(np.float64).sum(),
                             rtol=1e-5, err_msg=k)

# --- accumulation layout: [accum=2, batch=4, ...] ---
with mesh:
  batch = next(iter(data_lib.batched_loader(
      source, tokenizer, batch_size=4, accum_steps=2, shuffle=False,
      num_epochs=1, max_text_len=8, num_workers=1,
      sharding=lambda ndim: mesh_lib.data_sharding(
          mesh, ndim, batch_axis=1))))
assert batch['video'].shape == (2, 4, 2, 12, 12, 3), batch['video'].shape
ref = reference_batch(range(8), accum=2)
got = jax.tree.map(float, sum_all(batch))
for k, v in ref.items():
  np.testing.assert_allclose(got[k], v.astype(np.float64).sum(),
                             rtol=1e-5, err_msg=k)
# Microbatch pairing must survive the host split: per-microbatch sums.
mb_sum = jax.jit(
    lambda x: jnp.sum(x.astype(jnp.float32), axis=tuple(range(1, x.ndim))),
    out_shardings=repl)
np.testing.assert_allclose(
    np.asarray(mb_sum(batch['video'])),
    ref['video'].astype(np.float64).sum(axis=(1, 2, 3, 4, 5)), rtol=1e-5)

print(f'MULTIHOST-LOADER-OK proc={proc_id}', flush=True)
