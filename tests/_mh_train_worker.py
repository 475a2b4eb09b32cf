"""Worker for the two-process TRAINING test (spawned by
test_multiprocess.py).

The full production multi-host training config in one smoke: each process
initializes jax.distributed, loads its half of the global batch through
``batched_loader`` (multi-host mode), and runs TWO steps of the
FSDP-sharded CLIP train step over the cross-process mesh — params + AdamW
moments sharded over the data axis that spans both hosts, so the per-layer
weight all-gathers and gradient reduce-scatters ride the cross-process
collectives.  The resulting loss must match a locally computed
single-process reference step exactly.
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

from videoprism_tpu import assets
from videoprism_tpu.io.tokenizers import SentencePieceTokenizer
from videoprism_tpu.models import clip as vclip
from videoprism_tpu.parallel import mesh as mesh_lib
from videoprism_tpu.train import data as data_lib
from videoprism_tpu.train import (
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
)

TINY_CLIP = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, num_auxiliary_layers=1,
    vocabulary_size=1000, enable_causal_atten=True, num_unimodal_layers=2,
    norm_policy='pre', model_dim=16, num_heads=2, atten_logit_cap=50.0,
    scan=True)

cfg = vclip.VideoCLIPConfig(**TINY_CLIP)
optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                           total_steps=100)
# Same seed everywhere -> identical host params on both processes.
state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)

mesh = mesh_lib.make_mesh()  # (data=4, model=1) spanning both processes
step, fsdp_state = make_sharded_train_step(
    cfg, optimizer, mesh, state, fsdp=True, fsdp_min_size=0)

tokenizer = SentencePieceTokenizer(assets.test_spm_path())
source = data_lib.SyntheticSource(num_examples=8, num_frames=2, size=12)
loader = data_lib.batched_loader(
    source, tokenizer, batch_size=4, shuffle=False, num_epochs=2,
    max_text_len=8, num_workers=1,
    sharding=lambda ndim: mesh_lib.data_sharding(mesh, ndim))

rng = jax.random.PRNGKey(1)
losses = []
with mesh:
  for i, batch in zip(range(2), loader):
    fsdp_state, metrics = step(fsdp_state, batch, jax.random.fold_in(rng, i))
    losses.append(float(metrics['loss']))
assert int(jax.device_get(fsdp_state.step)) == 2

# Single-process reference: same params, same global batches (the loader
# is deterministic under shuffle=False), plain unsharded step.
ref_state = create_train_state(jax.random.PRNGKey(0), cfg, optimizer)
ref_step = jax.jit(make_train_step(cfg, optimizer))
ref_loader = data_lib.batched_loader(
    source, tokenizer, batch_size=4, shuffle=False, num_epochs=2,
    max_text_len=8, num_workers=1,
    process_index=0, process_count=1)
for i, batch in zip(range(2), ref_loader):
  ref_state, ref_metrics = ref_step(ref_state, batch,
                                    jax.random.fold_in(rng, i))
  np.testing.assert_allclose(losses[i], float(ref_metrics['loss']),
                             atol=1e-5, err_msg=f'step {i}')

print(f'MULTIHOST-TRAIN-OK proc={proc_id}', flush=True)
