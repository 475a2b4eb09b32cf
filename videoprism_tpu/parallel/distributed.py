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
) -> None:
  """Initializes jax.distributed if running under a multi-host launcher.

  With no arguments, relies on TPU metadata / environment auto-detection
  (works on Cloud TPU VMs).  Safe to call unconditionally: single-process
  runs are detected and skipped.

  Must run before anything initializes the XLA backend, so the guard only
  inspects jax's distributed global state — calling e.g.
  ``jax.process_count()`` here would itself initialize the backend and
  make ``jax.distributed.initialize`` unusable (found by the real
  two-process test, tests/test_multiprocess.py).
  """
  if _already_initialized():
    return
  explicit = coordinator_address is not None
  auto = any(
      v in os.environ
      for v in ('COORDINATOR_ADDRESS', 'TPU_WORKER_HOSTNAMES',
                'MEGASCALE_COORDINATOR_ADDRESS'))
  if not (explicit or auto):
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
