"""Multi-host (multi-process) initialization helpers.

On a multi-host TPU pod slice each host runs the same program;
``jax.distributed.initialize`` wires the hosts together so ``jax.devices()``
spans the full slice and GSPMD shardings ride ICI within a slice and DCN
across slices.  The reference has no distributed path at all (SURVEY.md
§2.7); this is the idiomatic JAX replacement for a NCCL/MPI bootstrap layer.
"""

from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    *,
    force: bool = False,
) -> None:
  """Initializes jax.distributed if running under a multi-host launcher.

  Any explicit argument means the caller knows this is a multi-host job —
  ``jax.distributed.initialize`` always runs then (it raises if the
  combination is incomplete, which beats silently training N independent
  single-host jobs).  With no arguments the env launchers set
  (``COORDINATOR_ADDRESS`` / ``TPU_WORKER_HOSTNAMES`` /
  ``MEGASCALE_COORDINATOR_ADDRESS``) gate the call; plain single-host
  dev runs skip it.  ``force=True`` calls it unconditionally and defers
  entirely to jax's own cluster auto-detection — required on platforms
  whose detection uses the cloud metadata server rather than env vars
  (e.g. GCE multi-host TPU VMs outside GKE).

  Must run before anything initializes the XLA backend, so the guard only
  inspects jax's distributed global state — calling e.g.
  ``jax.process_count()`` here would itself initialize the backend and
  make ``jax.distributed.initialize`` unusable (found by the real
  two-process test, tests/test_multiprocess.py).
  """
  if _already_initialized():
    return
  explicit = (coordinator_address is not None or num_processes is not None
              or process_id is not None)
  auto = any(
      v in os.environ
      for v in ('COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
                'MEGASCALE_COORDINATOR_ADDRESS'))
  if not (explicit or auto or force):
    return  # single host
  jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id,
  )


def _already_initialized() -> bool:
  state = getattr(jax._src.distributed, 'global_state', None)
  return bool(state and state.client is not None)


def is_primary() -> bool:
  """True on the process that should write checkpoints / logs."""
  return jax.process_index() == 0
