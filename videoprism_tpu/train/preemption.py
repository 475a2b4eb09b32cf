"""Preemption-safe training: catch the shutdown signal, checkpoint, exit
with a resumable status.

The reference has no failure-detection / elastic-recovery subsystem at
all (SURVEY.md §5 — "Failure detection / elastic recovery: absent").  On
TPU fleets that gap is operationally load-bearing: preemptible/spot
capacity and maintenance events terminate jobs routinely, always with a
SIGTERM + grace period ahead of the kill.  This module turns that signal
into an exact-resume point:

- :class:`PreemptionGuard` installs handlers that only SET A FLAG — a
  signal landing mid-dispatch never interrupts an in-flight XLA step.
  The training loop polls the flag at step boundaries, so the state it
  checkpoints is always a consistent post-step tree.
- :func:`exit_preempted` saves the full train state (and the EMA tree if
  tracked) through the trainer's existing orbax
  :class:`~videoprism_tpu.train.checkpointing.TrainCheckpointer`, waits
  for the async write to land, and exits with :data:`EXIT_PREEMPTED`
  (75, ``EX_TEMPFAIL``) so orchestrators can distinguish "interrupted
  but resumable" from success/failure and restart with ``--resume`` —
  which restores bit-exactly (loader fast-forward + fold_in(i) rng
  continuation, see scripts/train_clip.py).

Multi-host: hosts can receive the signal at different times, and a
sharded orbax save deadlocks unless EVERY process saves the same step.
:meth:`PreemptionGuard.should_stop` therefore agrees across processes
with a tiny flag allgather every ``sync_every`` steps; between sync
points even a locally-signaled host keeps stepping.  Single-process runs
short-circuit the collective entirely.
"""

from __future__ import annotations

import signal
from typing import Any, Sequence

import jax
import numpy as np

# os.EX_TEMPFAIL: "temporary failure, retry later" — the conventional
# exit status for interrupted-but-resumable work.
EXIT_PREEMPTED = 75


class PreemptionGuard:
  """Flag-only signal handler with cross-process agreement.

  Use as a context manager (restores previous handlers on exit) or via
  :meth:`install` in script ``main``\\ s that exit anyway::

      guard = PreemptionGuard().install()
      for i, batch in enumerate(loader):
        state, metrics = step_fn(state, batch, rng)
        if guard.should_stop(i + 1):
          exit_preempted(state, ckpt, logger, ...)
  """

  def __init__(self, signals: Sequence[int] = (signal.SIGTERM,),
               sync_every: int = 16):
    if sync_every <= 0:
      raise ValueError(f'sync_every must be positive, got {sync_every}')
    self._signals = tuple(signals)
    self._sync_every = sync_every
    self._prev: dict[int, Any] = {}
    self.triggered = False
    self.signum: int | None = None

  def _handler(self, signum, frame):
    del frame
    self.triggered = True
    self.signum = signum

  def install(self) -> 'PreemptionGuard':
    for s in self._signals:
      self._prev[s] = signal.signal(s, self._handler)
    return self

  def uninstall(self) -> None:
    for s, prev in self._prev.items():
      signal.signal(s, prev)
    self._prev.clear()

  def __enter__(self) -> 'PreemptionGuard':
    return self.install()

  def __exit__(self, *exc) -> bool:
    self.uninstall()
    return False

  def should_stop(self, step: int) -> bool:
    """True when training must checkpoint-and-exit at this step boundary.

    ``step`` is any counter that advances identically on every process
    (the loop index): multi-host agreement only runs when
    ``step % sync_every == 0`` so all processes enter the collective
    together.
    """
    if jax.process_count() == 1:
      return self.triggered
    if step % self._sync_every:
      return False
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray(self.triggered, dtype=np.bool_))
    return bool(np.any(flags))


def exit_preempted(state: Any, ckpt: Any, logger: Any, *,
                   ema_ckpt: Any = None, ema_state: Any = None,
                   already_saved: bool = False,
                   checkpoint_dir: str | None = None) -> None:
  """Checkpoint the train state and exit with :data:`EXIT_PREEMPTED`.

  ``already_saved`` skips the duplicate write when the loop's periodic
  ``maybe_save`` already covered this exact step.
  """
  step_no = int(jax.device_get(state.step))
  if ckpt is not None:
    if not already_saved:
      ckpt.save(step_no, state)
      if ema_ckpt is not None and ema_state is not None:
        ema_ckpt.save(step_no, ema_state)
    ckpt.wait()
    if ema_ckpt is not None:
      ema_ckpt.wait()
  if logger is not None:
    logger.event('preempted', step=step_no, saved=ckpt is not None)
    logger.close()
  detail = (f'checkpoint saved to {checkpoint_dir}; restart with --resume'
            if ckpt is not None else 'no --checkpoint-dir, progress lost')
  print(f'preempted at step {step_no}: {detail}', flush=True)
  raise SystemExit(EXIT_PREEMPTED)
