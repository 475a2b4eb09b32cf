"""Structured training/serving metrics: JSONL sink + console formatting.

The reference logs via bare ``print`` (SURVEY.md §5 "metrics/logging:
print-based").  Production training needs machine-readable history that
survives restarts and feeds dashboards; this module provides the minimal
idiomatic version with no extra dependencies:

  * :class:`MetricsLogger` — appends one JSON object per step to
    ``<dir>/metrics.jsonl`` (atomic line appends, flushed per write so a
    preempted job loses at most the current line), echoes a compact
    console line, and tracks steps/sec over a sliding window;
  * multi-host aware: only the primary process writes (pass
    ``only_primary=False`` to force).
"""

from __future__ import annotations

import collections
import json
import numbers
import os
import time
from typing import Any, IO

import jax


def _scalarize(value: Any):
  """Device/numpy arrays and numpy scalars -> JSON-native values."""
  if isinstance(value, (bool, int, float, str)) or value is None:
    return value
  if isinstance(value, numbers.Integral):
    return int(value)     # numpy integer scalars
  if isinstance(value, numbers.Real):
    return float(value)   # numpy float scalars
  try:
    import numpy as np

    arr = np.asarray(jax.device_get(value))
    if arr.ndim == 0:
      return arr.item()
    return arr.tolist()
  except Exception:
    return str(value)


class MetricsLogger:
  """Structured per-step metrics with a JSONL sink.

  Example::

      logger = MetricsLogger(workdir, console_every=10)
      for step, batch in enumerate(loader):
        state, metrics = train_step(state, batch, rng)
        logger.log(step, metrics)         # lazy: device_get only when written
      logger.close()
  """

  def __init__(
      self,
      directory: str | None = None,
      *,
      filename: str = 'metrics.jsonl',
      console_every: int = 1,
      window: int = 20,
      only_primary: bool = True,
  ):
    self._console_every = max(1, console_every)
    self._times: collections.deque[tuple[int, float]] = collections.deque(
        maxlen=window)
    self._file: IO[str] | None = None
    self._is_writer = (not only_primary) or jax.process_index() == 0
    if directory and self._is_writer:
      os.makedirs(directory, exist_ok=True)
      self._file = open(os.path.join(directory, filename), 'a')

  def log(self, step: int, metrics: dict[str, Any], **extra: Any) -> None:
    now = time.time()
    self._times.append((step, now))
    record = {'step': int(step), 'time': round(now, 3)}
    if len(self._times) >= 2:
      (s0, t0), (s1, t1) = self._times[0], self._times[-1]
      if t1 > t0 and s1 > s0:
        record['steps_per_sec'] = round((s1 - s0) / (t1 - t0), 4)
    for k, v in {**metrics, **extra}.items():
      record[k] = _scalarize(v)

    if self._file is not None:
      self._file.write(json.dumps(record) + '\n')
      self._file.flush()

    if self._is_writer and step % self._console_every == 0:
      shown = {k: v for k, v in record.items() if k not in ('time',)}
      parts = [f'step {shown.pop("step"):6d}']
      for k, v in shown.items():
        parts.append(f'{k} {v:.4f}' if isinstance(v, float) else f'{k} {v}')
      print('  '.join(parts), flush=True)

  def event(self, name: str, **fields: Any) -> None:
    """Logs a non-step event (checkpoint saved, restart, eval result)."""
    if self._file is not None:
      self._file.write(json.dumps(
          {'event': name, 'time': round(time.time(), 3),
           **{k: _scalarize(v) for k, v in fields.items()}}) + '\n')
      self._file.flush()

  def close(self) -> None:
    if self._file is not None:
      self._file.close()
      self._file = None

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
