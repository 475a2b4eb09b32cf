"""Shared tiny smoke-test architectures for the CLI scripts.

One source of truth for the ``--tiny`` geometries (the configs had begun
to drift between sibling scripts): a 2-frame 12x12 clip through a
2-spatial/1-temporal stack at model_dim 16.  Tests and CLIs that need
"the tiny model" import from here.
"""

TINY_ENC = dict(
    patch_size=6, pos_emb_shape=(2, 2, 2), num_spatial_layers=2,
    num_temporal_layers=1, mlp_dim=32, model_dim=16, num_heads=2,
    atten_logit_cap=50.0, scan=True)

TINY_CLIP = dict(
    **TINY_ENC, num_auxiliary_layers=1, enable_causal_atten=True,
    num_unimodal_layers=2, norm_policy='pre', vocabulary_size=1000)

# The [T, H, W, C] clip shape the tiny models expect.
TINY_CLIP_SHAPE = (2, 12, 12, 3)


def ensure_tpu_executes(timeout_s: float = 180.0) -> None:
  """Fail fast (exit 75, EX_TEMPFAIL) when the TPU claim is unavailable.

  The axon claim can be held elsewhere for hours; when it is,
  ``jax.devices()`` may still LIST the chip while any actual execution
  blocks in the claim-retry loop — a hardware smoke then burns its whole
  wall-clock and dies as a misleading downstream timeout.  This probes
  with a real tiny execution under a deadline: run it first in every
  hardware smoke so an unavailable claim is one clear line, not a
  10-minute hang.  (exit 75 so supervisors/retry wrappers treat it as
  "try again later", like the preemption exit.)

  The default budget is generous because plain claim ACQUISITION has
  been measured at ~50s under contention — the probe must distinguish
  "slow acquire" from "held elsewhere indefinitely".
  """
  import os
  import threading

  done = threading.Event()

  def probe():
    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.sum(jnp.ones((8, 8), jnp.float32)))
    done.set()

  t = threading.Thread(target=probe, daemon=True)
  t.start()
  if not done.wait(timeout_s):
    print(f'TPU claim unavailable: a trivial execution did not complete '
          f'in {timeout_s:.0f}s (the axon claim is likely held by another '
          f'process — retry later).', flush=True)
    os._exit(75)
