"""Subprocess body for test_mixup.py::test_mixup_sharded_step.

The GSPMD mixup step (cross-shard batch permutation collective) has
twice aborted the WHOLE suite process inside XLA:CPU's runtime
(`Fatal Python error: Aborted` during the result fetch) while passing
standalone and in chunked runs — an accumulated-process-state trigger in
the backend, not a defect in the step (see TODO.md round-4 incident
log).  Running the body in a fresh subprocess both avoids the trigger
and converts any recurrence into a legible single-test failure instead
of a dead pytest process.
"""

import sys

import numpy as np

from videoprism_tpu.utils.compilation_cache import force_cpu

force_cpu(8)

import jax  # noqa: E402

from videoprism_tpu.models import classifier as vc  # noqa: E402
from videoprism_tpu.models import factorized_encoder as fe  # noqa: E402
from videoprism_tpu.parallel import mesh as mesh_lib  # noqa: E402
from videoprism_tpu.train import make_optimizer  # noqa: E402
from videoprism_tpu.train.classifier_train_step import (  # noqa: E402
    create_classifier_train_state,
    make_sharded_classifier_train_step,
)


def main() -> int:
  enc = fe.FactorizedEncoderConfig(
      patch_size=6, pos_emb_shape=(2, 2, 2), model_dim=16,
      num_spatial_layers=2, num_temporal_layers=1, num_heads=2,
      mlp_dim=32, atten_logit_cap=50.0, scan=True)
  cfg = vc.VideoClassifierConfig(encoder=enc, num_classes=5)
  optimizer = make_optimizer(learning_rate=1e-3, warmup_steps=1,
                             total_steps=50)
  state = create_classifier_train_state(jax.random.PRNGKey(0), cfg,
                                        optimizer)
  mesh = mesh_lib.make_mesh(model_parallelism=1)
  step, state = make_sharded_classifier_train_step(
      cfg, optimizer, mesh, state, mixup_alpha=0.2, label_smoothing=0.1)
  rng = np.random.default_rng(4)
  batch = {
      'video': rng.random((8, 2, 12, 12, 3)).astype(np.float32),
      'label': rng.integers(0, 5, size=(8,)).astype(np.int32),
  }
  _, metrics = step(state, batch, jax.random.PRNGKey(0))
  loss = float(metrics['loss'])
  assert np.isfinite(loss), loss
  print(f'sharded mixup step OK: loss={loss:.4f}')
  return 0


if __name__ == '__main__':
  sys.exit(main())
