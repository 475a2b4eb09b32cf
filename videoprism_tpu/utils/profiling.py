"""Profiling and step-timing utilities.

The reference's only observability is ``time.perf_counter`` prints in its
benchmark script (reference scripts/benchmark_performance.py:90-134) and
``resource.getrusage`` RSS.  TPU-native equivalents here:

  * :func:`trace` — context manager around ``jax.profiler`` emitting an
    xplane trace viewable in TensorBoard / Perfetto;
  * :class:`StepTimer` — wall-clock step timing with device-sync via a
    scalar fetch (on tunneled backends ``block_until_ready`` can be a
    no-op, so forcing a tiny ``device_get`` is the only reliable sync);
  * :func:`memory_stats` — per-device HBM stats where the backend exposes
    them, plus host peak RSS.
"""

from __future__ import annotations

import contextlib
import resource
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/videoprism_tpu_trace'):
  """``with profiling.trace('/tmp/tb'): fn()`` — writes an xplane trace."""
  jax.profiler.start_trace(log_dir)
  try:
    yield log_dir
  finally:
    jax.profiler.stop_trace()


def sync(x) -> float:
  """Forces execution of ``x`` and returns a scalar derived from it.

  Reduces on-device and fetches 4 bytes; reliable even on tunneled
  backends where ``block_until_ready`` does not block.
  """
  leaf = jax.tree.leaves(x)[0]
  return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1])))


class StepTimer:
  """Accumulates per-step wall times with a device-sync per step.

  Example::

      timer = StepTimer()
      for batch in data:
        with timer.step():
          out = train_step(state, batch)
        timer.force(out)
      print(timer.summary(items_per_step=batch_size))
  """

  def __init__(self):
    self.times: list[float] = []
    self._t0: float | None = None

  @contextlib.contextmanager
  def step(self):
    t0 = time.perf_counter()
    yield
    self._t0 = t0

  def force(self, out) -> None:
    sync(out)
    assert self._t0 is not None, 'force() must follow a step() block'
    self.times.append(time.perf_counter() - self._t0)
    self._t0 = None

  def summary(self, items_per_step: float = 1.0,
              skip_warmup: int = 1) -> dict:
    times = self.times[skip_warmup:] or self.times
    p50 = statistics.median(times)
    return {
        'steps': len(times),
        'p50_ms': 1000 * p50,
        'mean_ms': 1000 * statistics.mean(times),
        'min_ms': 1000 * min(times),
        'max_ms': 1000 * max(times),
        'items_per_sec': items_per_step / p50,
    }


def memory_stats() -> dict:
  """HBM stats per device (if exposed) + host peak RSS in bytes."""
  out = {'host_peak_rss_bytes': resource.getrusage(
      resource.RUSAGE_SELF).ru_maxrss * 1024}
  for d in jax.devices():
    stats = getattr(d, 'memory_stats', lambda: None)()
    if stats:
      out[str(d)] = {
          'bytes_in_use': stats.get('bytes_in_use'),
          'peak_bytes_in_use': stats.get('peak_bytes_in_use'),
          'bytes_limit': stats.get('bytes_limit'),
      }
  return out
